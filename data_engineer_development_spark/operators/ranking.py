"""Distributed global ranking — dense global ``row_number`` WITHOUT the
single-partition window.

``Window.orderBy(...)`` with no partition spec is the classic scale-killer:
Spark moves the ENTIRE input into one task's sort (WindowExec even warns).
Fine over a bounded histogram; fatal over a 100 TB fact table or a
corpus-sized vocabulary. This module provides the exact, parallel
alternative used by ``ntile_deciles`` and ``dictionary_encode``:

1. ``repartitionByRange(parts, *order)`` — contiguous ordered key ranges,
   one parallel sort per partition. When the ordering is a total order
   (callers must include a tiebreaker), ANY sampled boundary placement
   yields the same global rank, so the sampling's nondeterminism never
   reaches the result.
2. per-partition ``row_number`` over ``Window.partitionBy(pid)`` — a
   partitioned, parallel window.
3. per-partition counts → cumulative offsets (a window over ``parts`` rows,
   bounded control-plane) broadcast back: global = offset + local.

Both consumers of the range exchange reuse it (ReusedExchange in the
plan), so partition ids are computed once and consistent.

Cost at scale: one range shuffle + one pid shuffle + a P-row broadcast —
every stage parallel, nothing proportional to the input ever collapses to
one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame,
    *order: Column | str,
    rank_col: str = "r",
    total_col: str | None = None,
    parts: int = 32,
) -> DataFrame:
    """Append a 1-based global ``row_number`` over ``order`` to ``df``.

    ``order`` must be a TOTAL order (include a unique tiebreaker) — with
    ties the split across range-partition boundaries would be arbitrary.
    ``total_col``, when given, also appends the total row count (needed by
    NTILE-style consumers) — it rides the same bounded offsets broadcast,
    costing nothing extra.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order]
    ranged = df.repartitionByRange(parts, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )

    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_pc"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_pc").over(w_off), F.lit(0)).alias("_offset"),
        F.sum("_pc").over(Window.partitionBy()).alias("_n_total"),
    )

    w_loc = Window.partitionBy("_pid").orderBy(*cols)
    out = (
        ranged.withColumn("_local", F.row_number().over(w_loc))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_offset") + F.col("_local")))
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("_n_total"))
    return out.drop("_pid", "_pc", "_local", "_offset", "_n_total")
