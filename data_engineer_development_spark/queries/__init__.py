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
# lesson). Round-6 front: the round-5 red/weak rows (civil_pipeline_e2e
# ANSI fix, streaming_running_totals' first real oracle) and every entry
# added this round. The remaining ~half of the window refreshes in module
# order. Every pair — all entries, regardless of order — stays verified by
# tests/test_oracle_parity.py under both ANSI modes.
_FRONT = [
    # round-5 red rows, now fixed
    "civil_pipeline_e2e", "streaming_running_totals",
    # never driver-checked (added round 5 after the window)
    "text_normalize", "text_familiarity", "text_length_trim",
    # new this round
    "substring_dedup", "phrase_search", "heavy_hitters",
    "compaction_plan", "skew_profile", "event_anomaly",
    "snapshot_diff", "fk_integrity", "range_partition_plan",
    "supplier_pagerank", "priority_order_check", "market_share",
    "sales_opportunity", "gapfill_daily", "vocab_coverage",
    "export_jsonl_roundtrip", "variant_json_stats",
    "stream_dedup_within_watermark", "recursive_reachability",
    "lateral_topk_orders", "multimodal_frame_sample",
    "er_candidate_pairs", "temporal_dim_join",
    "multimodal_audio_features", "stream_foreachbatch_upsert",
    # round-6 wave 2 (relational_more / quality_rules / scale_patterns /
    # passage+dedup+similarity evals). 53 never-checked entries compete for
    # the 50-slot driver window; the 3 that overflow (list tail) are chosen
    # as the lowest-risk shapes — each is a near-duplicate of an
    # already-driver-green pattern (forecast_revenue ≈ promo_revenue's
    # decimal filter-sum, ntile_deciles ≈ window_navigation's NTILE,
    # null_safe_join is a 6-row dialect corner) and all are both-ANSI green
    # in test_oracle_parity; they rotate in next round.
    "late_shipment_priority", "top_revenue_supplier",
    "product_type_profit", "nation_price_corr",
    "quality_gopher_rules", "text_diversity", "mix_temperature",
    "salted_skew_join", "multimodal_image_ahash", "bpe_pair_counts",
    "dedup_containment", "rolling_median_value", "ann_recall_eval",
    "lsh_candidate_recall", "click_attribution", "winsorized_stats",
    "export_csv_roundtrip", "dictionary_encode",
    "mad_value", "dpp_partition_join",
    # window overflow (positions 51-53) — see note above
    "forecast_revenue", "ntile_deciles", "null_safe_join",
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
    return _ordered(out)
