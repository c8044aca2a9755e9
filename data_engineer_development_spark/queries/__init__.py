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
    dq,
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
    training_mix, sampling, extras, contrastive, sketch_ops, dq,
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
    # r17 head (VERDICT r16 #1): the full 5-entry staged queue
    # registered — every one with operator + oracle + named tests +
    # tri-SF ANSI-on parity since r16 staging. New registrations are
    # never-checked and always precede rotation.
    "cdc_merge_snapshot", "stream_cdc_merge_snapshot",
    "approx_group_percentiles", "snapshot_maintenance_plan",
    "snapshot_log_checkpoint",
    # rotation (stalest driver evidence first, tools/suggest_front.py):
    # the full 13-entry r12 cohort (VERDICT r16 #5 — lifts the
    # staleness floor to r13), then the r13 cohort stalest-first.
    "scalar_subquery_pricey_parts", "grouping_sets_lineitem",
    "window_navigation", "quantiles_quantity", "big_orders",
    "moving_7d_orders", "cheapest_part_per_brand", "filtered_agg",
    "unpivot_part_metrics", "returned_item_revenue", "pivot_status",
    "array_agg_orders", "bpe_train",
    "export_jsonl_roundtrip", "export_csv_roundtrip",
    "export_orc_roundtrip", "compaction_plan", "skew_profile",
    "range_partition_plan", "schema_evolution_read",
    "streaming_running_totals", "text_token_stats", "text_repetition",
    "text_lang_id", "text_quality", "text_fingerprint",
    "pricing_summary", "quality_typed_select", "dim_decode",
    "identity_projection", "in_list_filter", "message_envelope",
    "json_extract", "variant_json_stats", "regexp_clean",
    "string_funcs", "null_handling", "lsh_candidate_recall",
    "split_leakage_audit", "volume_shipping", "promo_revenue",
    "disjunctive_revenue", "small_qty_revenue", "waiting_suppliers",
    "priority_order_check",
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
