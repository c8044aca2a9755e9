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
    training_mix, sampling, extras,
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
    # new this round: SemDeDup-style embedding-space dedup + its recall
    # eval against the exact quantized truth set
    "semantic_dedup", "semdedup_recall_eval",
    # rotation: latest driver row r5
    "volume_shipping", "promo_revenue", "disjunctive_revenue",
    "small_qty_revenue", "waiting_suppliers", "domain_mix",
    "pack_sequences", "chunk_documents", "zorder_layout",
    "sample_hash_bucket", "stratified_sample", "text_top_token_ratio",
    "token_count_bpe", "sim_ivf_topk", "range_join_promos",
    # rotation: latest driver row r6
    "civil_pipeline_e2e", "substring_dedup", "phrase_search",
    "heavy_hitters", "vocab_coverage", "bpe_pair_counts",
    "dictionary_encode", "event_anomaly", "snapshot_diff",
    "fk_integrity", "er_candidate_pairs", "temporal_dim_join",
    "streaming_running_totals", "stream_foreachbatch_upsert",
    "multimodal_frame_sample", "multimodal_audio_features",
    "multimodal_image_ahash", "text_normalize", "text_familiarity",
    "text_length_trim", "supplier_pagerank", "click_attribution",
    "gapfill_daily", "stream_dedup_within_watermark",
    "rolling_median_value", "dedup_containment", "lsh_candidate_recall",
    "priority_order_check", "market_share", "sales_opportunity",
    "recursive_reachability", "lateral_topk_orders",
    "top_revenue_supplier",
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
