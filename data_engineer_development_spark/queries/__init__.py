"""Query registry.

Each submodule exposes ``QUERIES: dict[str, Callable[(spark, sf_dir), DataFrame]]``
and ``ORACLE: dict[str, str]`` (DuckDB-runnable ANSI SQL over the same parquet
tables, same column aliases — SURVEY.md §5). The driver's correctness gate
compares the pair per name; entries without oracle SQL get rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_engineer_development_spark.queries import (
    analytics,
    contract_extras,
    contrastive,
    core,
    behavior,
    corpus_ops,
    dedup,
    extras,
    passage_ops,
    pipeline_e2e,
    quality_rules,
    relational_ext,
    relational_more,
    sampling,
    scalar_ops,
    scale_patterns,
    similarity,
    text_analysis,
    training_mix,
    warehouse_ops,
    timeseries,
)

_MODULES = [
    pipeline_e2e, passage_ops, warehouse_ops, contract_extras,
    text_analysis, core, scalar_ops, behavior, analytics,
    timeseries, dedup, similarity, corpus_ops, relational_ext,
    relational_more, quality_rules, scale_patterns,
    training_mix, sampling, extras, contrastive,
]

# The driver samples the FIRST 50 registry keys each round for its
# CORRECTNESS gate, so entries that have never earned a driver row (or
# whose latest row was red) are pinned to the front explicitly — module
# order alone can't express that across modules (round 5's text_normalize
# lesson; round 6's dedup_incremental/emb_centroid_by_label omission —
# now guarded by tests/test_registry_window.py, which recomputes the
# priority set from the CORRECTNESS_r*.json history and fails if any
# non-green entry sits outside the window head).
#
# Round-9 front (per tools/suggest_front.py over CORRECTNESS_r01–r08):
# zero red rows and zero never-checked entries remain, so the window is
# 2 new-entry slots (unproven entries always precede rotation) + 48
# rotation slots refreshing the stalest green rows — the 15 whose latest
# driver row is r5, then 33 of the r6 cohort, stalest-first
# (product_type_profit and nation_price_corr, the r6 tail, rotate next
# round). Every pair — all entries, regardless of order — stays verified
# by tests/test_oracle_parity.py under both ANSI modes.
_FRONT = [
    # net-new this round: multi-probe IVF (the standard recall/cost dial;
    # measured recall@5 0.400 -> 0.533 at nprobe 1 -> 2, sf0.1), the
    # streaming embedding near-dup gate (dedup-at-ingest: LSH-bucket keyed
    # state, drop-if-any-earlier-neighbor at quantized cosine >= tau),
    # hard-negative mining (per-anchor top-k cross-label neighbors,
    # IVF-cell restricted), and the JL random-projection distortion eval
    # (bounded-sample |cos_proj - cos_true| buckets). The last two displace
    # exactly two r7-latest rotation slots (asof_last_purchase,
    # daily_buckets) — both stay inside the freshness bar (nothing older
    # than r7 after this round) per tools/suggest_front.py.
    "sim_ivf_multiprobe", "stream_neardup_gate",
    "hard_negative_mining", "emb_jl_distortion",
    # re-driven this round: entries whose code or oracle materially
    # changed in r10 (semdedup family: Lloyd-trained codebook; IVF chain
    # refactored for nprobe; inference oracles: NULL-safe vec_id-only
    # join; streaming totals: loud overflow guard; cosine/IVF/contrastive
    # family: zero-norm + mixed-width exclusion hardening —
    # sim_cosine_topk / sim_neardup / sim_lsh_buckets, all r7-latest,
    # enter the changed block displacing the three least-stale rotation
    # tail entries (rollup_status_priority, agg_stats_per_nation,
    # anti_join_dormant_customers — likewise r7-latest): freshness-
    # neutral, and a changed plan needs driver re-validation more than an
    # untouched stale one)
    "sim_ivf_topk", "sim_cosine_topk", "sim_neardup", "sim_lsh_buckets",
    "semantic_dedup", "semdedup_recall_eval", "quality_model_score",
    "quality_stratified_sample", "stream_quality_gate", "streaming_running_totals",
    # rotation (stalest driver evidence first): the 9 r6-latest entries,
    # then the stalest r7 cohort in registry order (tools/suggest_front.py)
    "product_type_profit", "nation_price_corr", "mad_value",
    "quality_gopher_rules", "text_diversity", "mix_temperature",
    "salted_skew_join", "dpp_partition_join", "ann_recall_eval",
    "export_jsonl_roundtrip", "export_csv_roundtrip", "export_orc_roundtrip",
    "compaction_plan", "skew_profile", "range_partition_plan",
    "schema_evolution_read", "text_token_stats", "text_repetition",
    "text_lang_id", "text_quality", "text_fingerprint",
    "pricing_summary", "quality_typed_select", "dim_decode",
    "identity_projection", "in_list_filter", "message_envelope",
    "json_extract", "variant_json_stats", "regexp_clean",
    "string_funcs", "null_handling", "math_funcs",
    "join_star_broadcast", "left_join_order_counts", "semi_join_active_customers",
]


def _ordered(full: dict) -> dict:
    missing = [k for k in _FRONT if k not in full]
    assert not missing, f"_FRONT names not in registry: {missing}"
    out = {k: full[k] for k in _FRONT}
    out.update((k, v) for k, v in full.items() if k not in out)
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        assert not overlap, f"duplicate query names: {overlap}"
        out.update(m.QUERIES)
    return _ordered(out)


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    # Mirror all_queries()' exact ordering (not just the _FRONT head) so
    # the two registries stay positionally aligned for the driver window.
    order = {k: i for i, k in enumerate(all_queries())}
    return dict(sorted(_ordered(out).items(), key=lambda kv: order[kv[0]]))
