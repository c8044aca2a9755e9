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
    sketch_ops,
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
    training_mix, sampling, extras, contrastive, sketch_ops,
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
    # r14 head (VERDICT r13 #1 + #2): bpe_train_batched first — its r13
    # row was the registry's only non-green (rows-only, err "no_oracle");
    # it is now ORACLE-PAIRED via the unrolled batched-spec CTEs
    # (queries/extras._bpe_batched_sql) and must be re-driven under the
    # full hash gate — then the ENTIRE 20-entry staged queue registered
    # this round (every one with operator + oracle + named tests + tri-SF
    # ANSI-on parity + an idle BASELINE.md anchor on record since r13).
    "bpe_train_batched",
    "tokenizer_vocab_curve", "bm25_topk", "incremental_join",
    "image_ahash_neardup", "trading_communities", "dedup_modality_overlap",
    "source_overlap_matrix", "ngram_novelty", "dedup_survivorship",
    "decontam_span_removal", "emb_top_direction", "token_budget_mix",
    "length_bucket_batches", "domain_cap", "stream_domain_cap_gate",
    "retrieval_mrr_eval", "tokenizer_fertility", "cms_freq",
    "bloom_prune_eval", "join_size_estimate",
    # rotation (stalest driver evidence first, tools/suggest_front.py):
    # ALL 23 remaining r10-latest entries — after this round the
    # staleness floor is r11, the VERDICT r13 #3 done-criterion — then
    # the first 6 of the r11 cohort in registry order.
    "math_funcs", "join_star_broadcast", "left_join_order_counts",
    "semi_join_active_customers", "sim_cosine_topk", "sim_neardup",
    "sim_lsh_buckets", "quality_model_score", "quality_stratified_sample",
    "stream_quality_gate", "product_type_profit", "nation_price_corr",
    "mad_value", "quality_gopher_rules", "text_diversity",
    "mix_temperature", "salted_skew_join", "dpp_partition_join",
    "sim_ivf_topk", "sim_ivf_multiprobe", "ann_recall_eval",
    "hard_negative_mining", "emb_jl_distortion",
    "incremental_agg", "scd2_customer_merge", "rule_quarantine",
    "price_histogram", "stateful_sessions", "manifest_source",
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
    # Rows-only entries (in QUERIES but deliberately absent from ORACLE,
    # e.g. bpe_train_batched) simply have no row here — the driver falls
    # back to its rows-only check for them.
    order = {k: i for i, k in enumerate(all_queries())}
    unknown = [k for k in out if k not in order]
    assert not unknown, f"ORACLE names without a QUERIES entry: {unknown}"
    return dict(sorted(out.items(), key=lambda kv: order[kv[0]]))
