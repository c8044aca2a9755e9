"""Small literal DataFrames built as JVM plans.

``spark.createDataFrame([...python rows...])`` executes through a
Python-RDD task that pays an erratic multi-second worker round-trip
per execution (measured 5–8 s to write ONE manifest row vs 0.26 s for
the same row as a JVM literal — BASELINE.md round-15 discovery), so
every small dimension/manifest frame on a hot path builds here
instead: an exploded struct-array literal, one JVM-only task, no
Python execution anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def jvm_rows_df(
    spark: SparkSession, schema: str, rows: list[tuple]
) -> DataFrame:
    """``createDataFrame(rows, schema)`` semantics without the Python
    RDD: ``schema`` is the usual ``"name type, name type"`` DDL string,
    rows are Python tuples baked in as literals. An empty ``rows``
    yields a correctly-typed empty frame.

    The DDL goes through the real parser (``StructType.fromDDL``), so
    parameterized types — ``decimal(10,2)``, ``map<string,long>``,
    ``struct<...>`` — split correctly; a naive comma split would
    silently shred them into bogus columns (ADVICE r15). Each row must
    match the schema arity exactly, mirroring ``createDataFrame``'s
    fail-at-construction contract rather than a silent ``zip``
    truncation. Values must be ``F.lit``-able (scalars, Decimal,
    lists); dict/map values raise Spark's UNSUPPORTED_FEATURE at plan
    time — a map-bearing frame belongs on the Arrow createDataFrame
    path, not here."""
    cols = [
        (f.name, f.dataType.simpleString())
        for f in StructType.fromDDL(schema).fields
    ]
    for i, row in enumerate(rows):
        if len(row) != len(cols):
            raise ValueError(
                f"jvm_rows_df: row {i} has {len(row)} values, "
                f"schema has {len(cols)} columns ({schema!r})"
            )
    if not rows:
        return spark.range(0).select(
            *[F.lit(None).cast(t).alias(n) for n, t in cols]
        )
    arr = F.array(
        *[
            F.struct(
                *[
                    F.lit(v).cast(t).alias(n)
                    for v, (n, t) in zip(row, cols)
                ]
            )
            for row in rows
        ]
    )
    return spark.range(1).select(F.explode(arr).alias("r")).select("r.*")
