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
# Round-8 front (per tools/suggest_front.py over CORRECTNESS_r01–r07):
# zero red rows and zero never-checked entries remain, so the window is
# 3 new-entry slots (unproven entries always precede rotation) + 47
# rotation slots refreshing the stalest green rows — the 14 whose latest
# driver row is r4, then 33 of the r5 cohort, stalest-first. Every pair —
# all entries, regardless of order — stays verified by
# tests/test_oracle_parity.py under both ANSI modes.
_FRONT = [
    # new this round: batch model inference, its downsampling consumer,
    # and the streaming admission gate
    "quality_model_score", "quality_stratified_sample",
    "stream_quality_gate",
    # rotation: latest driver row r4
    "column_prune_filter", "top_unshipped_orders", "local_supplier_volume",
    "window_topk_per_segment", "window_running_total", "set_operations",
    "tumbling_hourly", "sliding_hourly", "session_windows",
    "stream_dedup_users", "stream_enrich_join", "stream_stream_join",
    "pivot_status", "array_agg_orders",
    # rotation: latest driver row r5
    "incremental_agg", "scd2_customer_merge", "rule_quarantine",
    "price_histogram", "stateful_sessions", "manifest_source",
    "kv_store_roundtrip", "multimodal_features", "multimodal_resize",
    "multimodal_metadata", "funnel_signup_purchase", "retention_cohorts",
    "latest_event_per_user", "salted_agg_event_types", "dedup_clusters",
    "dedup_cleaned_corpus", "contamination_check", "emb_quantize",
    "distinct_kmv", "kmv_merge", "tfidf_top_terms", "pii_mask",
    "exists_high_quantity", "scalar_subquery_pricey_parts",
    "grouping_sets_lineitem", "window_navigation", "quantiles_quantity",
    "big_orders", "moving_7d_orders", "cheapest_part_per_brand",
    "filtered_agg", "unpivot_part_metrics", "returned_item_revenue",
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
