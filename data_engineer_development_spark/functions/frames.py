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


def jvm_rows_df(
    spark: SparkSession, schema: str, rows: list[tuple]
) -> DataFrame:
    """``createDataFrame(rows, schema)`` semantics without the Python
    RDD: ``schema`` is the usual ``"name type, name type"`` DDL string
    (simple types), rows are Python tuples baked in as literals. An
    empty ``rows`` yields a correctly-typed empty frame."""
    cols = []
    for part in schema.split(","):
        name, typ = part.strip().split(None, 1)
        cols.append((name, typ.strip()))
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
