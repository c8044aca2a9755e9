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
    relational_ext,
    sampling,
    scalar_ops,
    similarity,
    text_analysis,
    training_mix,
    warehouse_ops,
    timeseries,
)

# Registry order. The driver samples the first 50 keys in insertion order,
# so the front-listed modules are the ones needing a fresh driver row this
# round: pipeline_e2e (the round-5 ANSI fix re-check), passage_ops (new this
# round: substring_dedup / phrase_search / heavy_hitters), warehouse_ops
# (new compaction_plan / skew_profile / event_anomaly), contract_extras
# (streaming_running_totals' new oracle + multimodal NULL-text oracle fix),
# text_analysis (text_normalize's first-ever row), then core / scalar_ops /
# analytics — exactly 50 keys. Every pair — all entries, regardless of
# order — stays verified by tests/test_oracle_parity.py under both ANSI
# modes.
_MODULES = [
    pipeline_e2e, passage_ops, warehouse_ops, contract_extras,
    text_analysis, core, scalar_ops, analytics, timeseries, dedup,
    similarity, corpus_ops, relational_ext, behavior,
    training_mix, sampling, extras,
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        assert not overlap, f"duplicate query names: {overlap}"
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
