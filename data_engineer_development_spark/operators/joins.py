"""Join operators beyond Spark's built-ins (SURVEY.md §2.4 notes).

The reference contains zero JOINs (dimension decoding is inline CASE,
export_svg.py:209-694), but its dims layer exists so facts can be joined to
it; the engine therefore treats joins as first-class. Spark's own
inner/outer/semi/anti/cross come free — this module adds the time-ordered
**as-of join** and the bin-bucketed **range join** Spark lacks, plus a
**salted aggregation** for skewed keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    point_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bin_width: int,
    point_bin_expr: Column | None = None,
) -> DataFrame:
    """Point-in-interval join: left rows whose ``point_col`` ∈
    [start, end) of some interval, WITHOUT a cross join.

    Both sides are bucketed into fixed-width bins (integer ``value //
    bin_width``): each left point has exactly ONE bin; each interval
    explodes into the bins it overlaps (``sequence(start_bin, end_bin)``,
    bounded by interval length / bin width). The join is then a plain
    equi-join on the bin plus the residual range filter — it partitions,
    broadcasts, and AQE-plans like any equi-join, which is what survives at
    100 TB where ``a JOIN b ON point BETWEEN s AND e`` degenerates to a
    nested loop. No duplicates by construction (one bin per point).

    ``point_col``/``start_col``/``end_col`` must be numeric (cast dates to
    epoch days / timestamps to epoch seconds first).
    """
    p_bin = (
        point_bin_expr
        if point_bin_expr is not None
        else (F.col(point_col) / bin_width).cast("long")
    )
    l_b = left.withColumn("__bin", p_bin)
    i_b = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.col(start_col) / bin_width).cast("long"),
                (F.col(end_col) / bin_width).cast("long"),
            )
        ),
    )
    return (
        l_b.join(i_b, "__bin")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("__bin")
    )


def _parse_aliased_agg(a: Column) -> tuple[str, str, bool]:
    """Return (function_name, alias, is_distinct) for an ``fn(col).alias(x)``
    Column.

    Walks the classic-mode ColumnNode tree (``Alias(UnresolvedFunction(...))``)
    rather than parsing ``str(Column)``: Spark 4's Column repr DROPS the
    DISTINCT keyword (``str(count_distinct(x).alias('a')) ==
    "Column<'count(x) AS a'>"``), so repr text cannot distinguish a
    decomposable count from a non-decomposable count(DISTINCT). Falls back to
    repr parsing (which then cannot see DISTINCT and conservatively REJECTS)
    only when the JVM tree is unreachable (e.g. Spark Connect columns).
    """
    import re as _re

    try:
        node = a._jc.node()
        if node.getClass().getSimpleName() == "Alias":
            child = node.child()
            if child.getClass().getSimpleName() == "UnresolvedFunction":
                return (
                    child.functionName().lower(),
                    node.name().head(),
                    bool(child.isDistinct()),
                )
    except Exception:
        pass
    text = str(a)
    m = _re.match(r"Column<'\s*([A-Za-z_]+)\s*\(.*\sAS\s`?(\w+)`?'?>?$", text)
    if not m:
        raise ValueError(
            f"salted_agg: cannot parse aggregate expression {text!r}; "
            "pass fn(col).alias(name) expressions"
        )
    # Fallback path (non-classic columns only): flag DISTINCT when the repr
    # shows it. Classic-mode columns never reach here, and Connect column
    # reprs render the expression text (including DISTINCT), so the silent
    # repr-hides-DISTINCT hole is specific to classic mode — which the tree
    # walk above covers.
    distinct = bool(_re.search(r"\bDISTINCT\b", text, _re.IGNORECASE))
    return m.group(1).lower(), m.group(2), distinct


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups by (key, random salt) so a hot key's rows spread over
    ``salt_buckets`` reducers; phase 2 re-aggregates the per-salt partials.
    Only algebraic aggregates decompose this way — the caller passes the
    *partial* aggregate expressions (each ``.alias``-ed), and this helper
    re-applies them by alias for the final phase, picking the merge
    function from the aggregate EXPRESSION itself (count→sum, sum→sum,
    max→max, min→min) — never from the alias text, so a creatively-named
    alias cannot silently mis-merge.

    Spark's AQE skew handling covers sort-merge *joins*; skewed *group-by*
    keys still funnel into one reducer without salting — this is the
    standard fix, made reusable.
    """
    _MERGE = {"count": F.sum, "sum": F.sum, "max": F.max, "min": F.min}
    merge_by_alias: dict[str, Column] = {}
    for a in aggs:
        fn, alias, distinct = _parse_aliased_agg(a)
        # DISTINCT does not decompose over salt buckets: the same distinct
        # value lands in several buckets and a SUM of per-salt partials
        # silently over-counts — refuse rather than mis-merge.
        if distinct:
            raise ValueError(
                f"salted_agg: '{fn}(DISTINCT ...) AS {alias}' is not "
                "decomposable across salt buckets (the same value can land "
                "in multiple buckets and would be double-counted); "
                "deduplicate first or use an approx sketch (KMV/HLL)"
            )
        if fn not in _MERGE:
            raise ValueError(
                f"salted_agg: aggregate '{fn}' (alias '{alias}') is not "
                "algebraically mergeable here; supported: count/sum/max/min "
                "(compute avg as sum+count merged then divide)"
            )
        merge_by_alias[alias] = _MERGE[fn](alias).alias(alias)

    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*group_cols, "__salt").agg(*aggs)
    merge_exprs = []
    for c in partial.columns:
        if c in group_cols or c == "__salt":
            continue
        if c not in merge_by_alias:
            raise ValueError(
                f"salted_agg: no merge rule for output column '{c}' "
                "(every aggregate must carry an explicit .alias)"
            )
        merge_exprs.append(merge_by_alias[c])
    return partial.groupBy(*group_cols).agg(*merge_exprs)


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

    The payload columns are forward-filled as ONE struct, not column-by-
    column: a right row whose payload is partly NULL still carries its
    non-null struct wrapper, so (a) a matched row's genuine NULL payload is
    attached as NULL (DuckDB/kdb ASOF semantics) instead of an older row's
    value leaking through, and (b) a left row can never receive a torn
    combination of fields from two different right rows.

    Requires unique (key, right_time) pairs on the right for deterministic
    payloads (dedup upstream with a row_number pick).

    Ties (right_time == left_time) match, same as DuckDB/kdb ASOF semantics.
    """
    from pyspark.sql.types import StructField, StructType

    keys = [key] if isinstance(key, str) else list(key)

    payload_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in right_payload]
    )
    left_cols = left.columns
    l_aligned = left.select(
        *left_cols,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__r"),
    )
    r_aligned = right.select(
        *[
            F.col(c) if c in keys else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in right_payload]).alias("__r"),
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_aligned.unionByName(r_aligned).withColumn(
        "__f", F.last(F.col("__r"), ignorenulls=True).over(w)
    )
    out_payload: list[Column] = [
        F.col("__f").getField(c).alias(f"{c}{suffix}") for c in right_payload
    ]
    return filled.filter(F.col("__side") == 1).select(*left_cols, *out_payload)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    row_salt: Column,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-mitigating equi-join: spread a hot fact key over
    ``salt_buckets`` reducers by salting the FACT side with a per-row value
    and replicating the DIM side once per salt.

    ``row_salt`` must be derived from a column that varies WITHIN a join
    key (e.g. ``xxhash64(order_id)`` when joining on ``customer_id``) —
    salting by the join key itself would put a hot key's rows back into one
    bucket. The salt is deterministic (hash, not rand) so results are
    reproducible and retries/speculative tasks agree.

    Cost model: the dim side shuffles ``salt_buckets``× its size; the fact
    side shuffles once as before but with a ``salt_buckets``× finer key.
    Worth it only when one reducer would otherwise hold a key with more
    rows than fit in an executor — AQE's skew-join split
    (``spark.sql.adaptive.skewJoin``) is the zero-code first line of
    defense; this is the portable explicit form for engines/joins AQE
    can't split (e.g. a subsequent keyed aggregation on the same hot key,
    see ``salted_agg``).

    Result is EXACTLY the plain inner join (each fact row meets each
    matching dim row exactly once — the replicated dim copy with the
    matching salt).
    """
    # coalesce: a NULL row_salt (e.g. a hash of a NULL column) must not
    # silently drop a key-matching fact row — "exactly the plain inner
    # join" includes those rows, parked in bucket 0
    salted_fact = fact.withColumn(
        "__salt",
        F.coalesce(F.pmod(row_salt, F.lit(salt_buckets)), F.lit(0)).cast(
            "int"
        ),
    )
    rep = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    cond = (salted_fact[fact_key] == rep[dim_key]) & (
        salted_fact["__salt"] == rep["__salt"]
    )
    return salted_fact.join(rep.hint("merge"), cond, "inner").drop("__salt")
