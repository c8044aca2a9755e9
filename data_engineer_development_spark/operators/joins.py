"""Join operators beyond Spark's built-ins (SURVEY.md §2.4 notes).

The reference contains zero JOINs (dimension decoding is inline CASE,
export_svg.py:209-694), but its dims layer exists so facts can be joined to
it; the engine therefore treats joins as first-class. Spark's own
inner/outer/semi/anti/cross come free — this module adds the time-ordered
**as-of join** Spark lacks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    left_time: str,
    right_time: str,
    right_payload: Sequence[str],
    suffix: str = "",
) -> DataFrame:
    """Left as-of join: for each left row, attach the right row with the
    greatest ``right_time <= left_time`` within the same key group.

    Implementation is the union + forward-fill pattern, NOT a range
    cross-join: both sides are tagged and unioned, then a single window
    (partitionBy key, orderBy time with right-before-left tie order) forward-
    fills the most recent right payload onto each left row with
    ``last(..., ignorenulls)``. One shuffle on the key, no row explosion —
    at 100 TB this is a sort-merge-shaped plan that scales linearly, whereas
    the naive ``l JOIN r ON l.k = r.k AND r.t <= l.t`` + max() approach
    explodes to |matches| rows before aggregating.

    Requires unique (key, right_time) pairs on the right for deterministic
    payloads (dedup upstream with a row_number pick).

    Ties (right_time == left_time) match, same as DuckDB/kdb ASOF semantics.
    """
    keys = [key] if isinstance(key, str) else list(key)

    l_tag = left.withColumn("__t", F.col(left_time)).withColumn("__side", F.lit(1))
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    )
    left_cols = left.columns
    l_aligned = l_tag.select(
        *left_cols,
        "__t",
        "__side",
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_payload],
    )
    r_aligned = r_tag.select(
        *[
            F.col(c) if c in keys else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        "__t",
        "__side",
        *[f"__r_{c}" for c in right_payload],
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_aligned.unionByName(r_aligned)
    for c in right_payload:
        filled = filled.withColumn(
            f"__f_{c}", F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
        )
    out_payload: list[Column] = [
        F.col(f"__f_{c}").alias(f"{c}{suffix}") for c in right_payload
    ]
    return filled.filter(F.col("__side") == 1).select(*left_cols, *out_payload)
