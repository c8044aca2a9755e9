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

_MODULES = [
    core, scalar_ops, analytics, timeseries, text_analysis, dedup,
    similarity, extras, contract_extras, pipeline_e2e, relational_ext,
    sampling, corpus_ops, behavior, warehouse_ops, training_mix,
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
