"""Relational-completeness extensions, wave 4: the remaining TPC-H query
shapes expressible over the driver's star schema (Q6 forecast filter-agg,
Q12 late-shipment two-way classification, Q15 top-supplier scalar-subquery
over a CTE, Q9 profit rollup), plus NTILE decile banding and a
deterministic Pearson correlation built from exact decimal moment sums.

The reference's SQL surface stops at DISTINCT + CASE
(/root/reference/airflow-dags/export_svg.py:209-694, SURVEY.md §2.5);
these continue the warehouse-dialect completeness program of
relational_ext.py.

Scale notes (100 TB design, tested at sf0.01/0.1):
- Q6/Q12/Q15/Q9 all reduce lineitem with a pushed-down shipdate range
  BEFORE any join (PushedFilters verified by tests/test_plans.py patterns);
  dims broadcast; the only shuffles are the final group-bys on low-card keys.
- The correlation query computes per-group moment sums (one shuffle) and
  finishes with scalar double math — corr over N rows costs the same
  aggregate pass as a SUM, no second scan, no driver math over rows.
- NTILE over a global ORDER BY is a single-partition window by definition;
  at 100 TB the same banding is produced scalably by range-partitioned
  boundaries (see range_partition_plan / zorder_layout) — this entry pins
  the exact NTILE semantics the dialect promises.

Determinism discipline (oracle hash-match): money aggregates accumulate in
DECIMAL (exact, order-independent); the correlation's final formula runs on
doubles derived from exact decimals using only +,-,*,/,sqrt — all IEEE
correctly-rounded, so Spark (JVM) and DuckDB (C++) produce bit-identical
results. No transcendentals (ln/exp/pow), whose last-ulp behavior is
library-specific, appear in any hash-matched expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineer_development_spark.sources import load_table, register_views

_DEC_PRICE = "decimal(18,4)"
_DEC_RATE = "decimal(8,4)"


def _disc_price() -> Column:
    return F.col("l_extendedprice").cast(_DEC_PRICE) * (
        F.lit(1).cast("decimal(5,4)") - F.col("l_discount").cast(_DEC_RATE)
    )


# --------------------------------------------------------------------------
# TPC-H Q6 shape: forecast-revenue-change — the canonical filter-and-sum.
# The whole query is one scan: every predicate (shipdate range, discount
# band, quantity cap) pushes into the parquet reader, and the single
# decimal SUM map-side combines, so the exchange moves one partial row per
# task regardless of input size.
# --------------------------------------------------------------------------
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.sum(
        F.col("l_extendedprice").cast(_DEC_PRICE)
        * F.col("l_discount").cast(_DEC_RATE)
    )
    return li.agg(F.round(rev, 4).cast("double").alias("revenue"))


_FORECAST_REVENUE_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                      * CAST(l_discount AS DECIMAL(8,4))), 4) AS DOUBLE)
       AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# TPC-H Q12 shape, adapted to the driver schema (no l_shipmode /
# l_receiptdate columns exist in TESTDATA.md's lineitem): classify order
# priorities into high/low and count late shipments, where "late" means the
# line shipped more than 90 days after the order date. Same plan shape as
# Q12: one fact-fact join on the order key, conditional counts in one pass.
# --------------------------------------------------------------------------
def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    prio = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high"
    ).otherwise("low")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(prio.alias("priority_class"))
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).alias("late_lines"),
            F.sum(F.when(late, 0).otherwise(1)).alias("ontime_lines"),
        )
        .orderBy("priority_class")
    )


_LATE_SHIPMENT_SQL = """
SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 'high' ELSE 'low' END AS priority_class,
       CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,
       CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                     THEN 0 ELSE 1 END) AS BIGINT) AS ontime_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# TPC-H Q15 shape: top supplier by quarterly revenue — CTE + scalar
# subquery over the SAME CTE (Catalyst evaluates the revenue aggregate
# once, reuses it for both the join input and the MAX; the equality compare
# happens on exact decimals so "the max" is unambiguous).
# --------------------------------------------------------------------------
_TOP_SUPPLIER_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4))
             * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(8,4))))
         AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name,
       CAST(ROUND(total_rev, 4) AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
ORDER BY s_suppkey
"""


def q_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(_TOP_SUPPLIER_SQL)


# --------------------------------------------------------------------------
# TPC-H Q9 shape: product-type profit rollup by supplier nation × order
# year. The driver schema has no partsupp/ps_supplycost, so cost is modeled
# as 80% of the part's retail price per unit — the plan shape (LIKE-filtered
# part broadcast into lineitem, two more dim hops, group on nation × year)
# is Q9's; only the cost constant differs.
# --------------------------------------------------------------------------
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    cost = (
        F.col("p_retailprice").cast(_DEC_PRICE)
        * F.col("l_quantity").cast("decimal(12,4)")
        * F.lit("0.8").cast("decimal(5,4)")
    )
    profit = _disc_price().cast("decimal(30,8)") - cost.cast("decimal(30,8)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.round(F.sum(profit), 4).cast("double").alias("profit"))
        .orderBy("nation", "o_year")
    )


_PRODUCT_PROFIT_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(ROUND(SUM(
         CAST(CAST(l_extendedprice AS DECIMAL(18,4))
              * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(8,4)))
              AS DECIMAL(30,8))
         - CAST(CAST(p_retailprice AS DECIMAL(18,4))
                * CAST(l_quantity AS DECIMAL(12,4))
                * CAST('0.8' AS DECIMAL(5,4)) AS DECIMAL(30,8))
       ), 4) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# NTILE decile banding over order value — WITHOUT the classic scale-killer
# (a global `Window.orderBy(...)` with no partition collapses the whole
# table into ONE task's sort). Exact NTILE semantics are recovered from a
# two-pass partition-offset rank (operators/ranking.py with_global_rank):
#
#   1. `repartitionByRange(price, orderkey)` gives contiguous, ordered key
#      ranges per partition (P parallel sorts, never a global one). The
#      tiebreaker o_orderkey makes the order total, so ANY boundary
#      placement yields the same global rank.
#   2. `monotonically_increasing_id` projected AFTER the sort — the
#      zipWithIndex idiom: partition id in the high bits, local row number
#      in the low 33, NO second shuffle (a Window.partitionBy(pid) would
#      hash-exchange the whole input again — measured 3.6× slower).
#   3. Per-partition counts → cumulative offsets (a window over P≈32 rows,
#      bounded control-plane) broadcast back; global rank = offset + local.
#   4. NTILE(10)'s closed form from the rank: with N rows the first
#      N%10 tiles hold ⌈N/10⌉ rows — all-integer ceil-division, exact in
#      both engines.
#
# The ranked intermediate is persisted (tracked, released per entry) so the
# counts branch and the join branch read ONE materialization — the
# nondeterministic id projection defeats ReusedExchange, and two
# independent runs of the sampled range shuffle need not agree (see
# operators/ranking.py module docstring). Cost at scale: one range shuffle
# + a P-row agg/broadcast + the final 10-group agg — every stage parallel.
# The oracle keeps DuckDB's literal NTILE, proving the decomposition IS
# NTILE.
# --------------------------------------------------------------------------
def q_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineer_development_spark.operators.ranking import (
        with_global_rank,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderkey"
    )
    ranked = with_global_rank(
        orders, "o_totalprice", "o_orderkey",
        rank_col="r", total_col="n_total",
    )

    # NTILE(10) closed form over (rank, total) — see ntile_from_rank;
    # requires N >= 10, guaranteed by the orders fixture.
    from data_engineer_development_spark.operators.ranking import (
        ntile_from_rank,
    )

    decile = ntile_from_rank(10)
    return (
        ranked.select(
            "o_totalprice",
            decile.cast("int").alias("decile"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast(_DEC_PRICE)), 4)
            .cast("double")
            .alias("decile_value"),
        )
        .orderBy("decile")
    )


_NTILE_DECILES_SQL = """
SELECT decile, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4) AS DOUBLE)
       AS decile_value
FROM (SELECT o_totalprice,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders)
GROUP BY decile ORDER BY decile
"""


# --------------------------------------------------------------------------
# Deterministic Pearson correlation per nation between order value and the
# customer's account balance. Built-in CORR accumulates doubles in
# partition order and cannot hash-match a single-threaded oracle; instead
# the five moment sums accumulate EXACTLY (order-independent), and the
# closed-form corr runs on doubles with only correctly-rounded IEEE ops
# (*, -, /, sqrt). One shuffle total — same cost as a plain SUM.
#
# Pearson corr is scale-invariant, so both measures are first scaled to
# integer cents (ROUND(x*100) — exact and identical in both engines);
# per-row moment products then fit int64 (≤ ~4e15 here) and their sums
# accumulate in DECIMAL(38,0), sidestepping the engines' DIFFERENT decimal
# multiplication precision-capping rules (Spark rescales (20,4)×(20,4) to
# scale 6; DuckDB overflows its int64 fast path) that make fractional
# decimal products non-portable.
# --------------------------------------------------------------------------
def q_nation_price_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("x"),
            F.round(F.col("c_acctbal") * 100).cast("bigint").alias("y"),
        )
    )
    x, y = F.col("x"), F.col("y")
    big = "decimal(38,0)"
    agg = joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast("decimal(20,0)")).alias("sx"),
        F.sum(y.cast("decimal(20,0)")).alias("sy"),
        F.sum((x * y).cast(big)).alias("sxy"),
        F.sum((x * x).cast(big)).alias("sxx"),
        F.sum((y * y).cast(big)).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    num = nd * F.col("sxy").cast("double") - sx * sy
    denx = F.sqrt(nd * F.col("sxx").cast("double") - sx * sx)
    deny = F.sqrt(nd * F.col("syy").cast("double") - sy * sy)
    return agg.select(
        "nation",
        "n",
        F.when(denx * deny != 0.0, num / (denx * deny)).alias("corr_price_bal"),
    ).orderBy("nation")


_NATION_CORR_SQL = """
WITH cents AS (
  SELECT n_name,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS y
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey),
m AS (
  SELECT n_name AS nation, COUNT(*) AS n,
         SUM(CAST(x AS DECIMAL(20,0))) AS sx,
         SUM(CAST(y AS DECIMAL(20,0))) AS sy,
         SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy,
         SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
         SUM(CAST(y * y AS DECIMAL(38,0))) AS syy
  FROM cents
  GROUP BY n_name)
SELECT nation, n,
       CASE WHEN sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <> 0.0
            THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       END AS corr_price_bal
FROM m ORDER BY nation
"""


# --------------------------------------------------------------------------
# Winsorized (outlier-clamped) statistics per event type: values are capped
# at the in-group 1/16 and 15/16 quantiles before summing — the robust
# aggregate a telemetry pipeline uses when a single corrupt reading would
# swamp a mean. Quantile fractions are EXACT BINARY (k/16), so both
# engines' different interpolation formulas (lo+(hi-lo)·f vs
# lo·(1−f)+hi·f) evaluate the same exact rational on integer cents and
# agree bit-for-bit — at 0.05/0.95 (no binary representation) they diverge
# in the last ulp and break hash checks. One window pass computes the
# bounds, one group-by aggregates; both shuffle only on event_type.
# --------------------------------------------------------------------------
_WINSOR_LO, _WINSOR_HI = 0.0625, 0.9375


def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.round(F.col("value") * 100).cast("bigint")
    wspec = Window.partitionBy("event_type")
    lo = F.expr(f"percentile(v_cents, {_WINSOR_LO})").over(wspec)
    hi = F.expr(f"percentile(v_cents, {_WINSOR_HI})").over(wspec)
    clamped = F.greatest(
        F.col("lo"), F.least(F.col("hi"), F.col("v_cents").cast("double"))
    )
    return (
        ev.withColumn("v_cents", v)
        .withColumn("lo", lo)
        .withColumn("hi", hi)
        .withColumn("wv", clamped)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("v_cents") < F.col("lo"), 1).otherwise(0))
            .alias("n_clamped_low"),
            F.sum(F.when(F.col("v_cents") > F.col("hi"), 1).otherwise(0))
            .alias("n_clamped_high"),
            (
                F.sum(F.col("wv").cast("decimal(20,4)")).cast("double")
                / F.lit(100.0)
            ).alias("winsorized_total"),
        )
        .orderBy("event_type")
    )


_WINSORIZED_SQL = f"""
WITH b AS (
  SELECT event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS v_cents,
         quantile_cont(CAST(ROUND(value * 100) AS BIGINT), {_WINSOR_LO})
           OVER (PARTITION BY event_type) AS lo,
         quantile_cont(CAST(ROUND(value * 100) AS BIGINT), {_WINSOR_HI})
           OVER (PARTITION BY event_type) AS hi
  FROM events)
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CASE WHEN v_cents < lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clamped_low,
       CAST(SUM(CASE WHEN v_cents > hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clamped_high,
       CAST(SUM(CAST(GREATEST(lo, LEAST(hi, CAST(v_cents AS DOUBLE)))
                     AS DECIMAL(20,4))) AS DOUBLE) / 100.0
         AS winsorized_total
FROM b GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH
# each other instead of vanishing — the dialect corner that silently drops
# rows when a "join on possibly-null code" is written with plain =. The
# fixture NULLs out the 'P' order status on both sides (reference-style
# sentinel cleansing produces exactly such nullable codes,
# functions/scalars.sentinel_to_null) and joins per-status aggregates;
# the NULL row surviving the join is the behavior under test.
# --------------------------------------------------------------------------
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    status = F.when(
        F.col("o_orderstatus") == "P", F.lit(None)
    ).otherwise(F.col("o_orderstatus"))
    early = (
        orders.filter(F.col("o_orderdate") < "1998-01-01")
        .groupBy(status.alias("status_a"))
        .agg(F.count(F.lit(1)).alias("n_early"))
    )
    late = (
        orders.filter(F.col("o_orderdate") >= "1998-01-01")
        .groupBy(status.alias("status_b"))
        .agg(F.count(F.lit(1)).alias("n_late"))
    )
    return (
        early.join(late, early["status_a"].eqNullSafe(late["status_b"]))
        .select(
            F.col("status_a").alias("status"),
            "n_early",
            "n_late",
        )
        .orderBy(F.col("status").asc_nulls_first())
    )


_NULL_SAFE_JOIN_SQL = """
WITH early AS (
  SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END
           AS status_a,
         COUNT(*) AS n_early
  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1),
late AS (
  SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END
           AS status_b,
         COUNT(*) AS n_late
  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01' GROUP BY 1)
SELECT early.status_a AS status, n_early, n_late
FROM early JOIN late ON early.status_a IS NOT DISTINCT FROM late.status_b
ORDER BY status ASC NULLS FIRST
"""


# --------------------------------------------------------------------------
# Median absolute deviation per event type — winsorize's sibling robust
# scale estimator (stddev is wrecked by the same outliers winsorize
# clamps). Integer-cent inputs make the inner median exact half-integers
# and the outer median of |x − med| exact quarter-integers; every
# interpolation is an exact binary rational, so both engines agree
# bit-for-bit. Two window/group passes over the same event_type shuffle.
# --------------------------------------------------------------------------
def q_mad_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wspec = Window.partitionBy("event_type")
    med = F.expr("percentile(v_cents, 0.5)").over(wspec)
    base = (
        ev.withColumn(
            "v_cents", F.round(F.col("value") * 100).cast("bigint")
        )
        .withColumn("med", med)
        .withColumn("absdev", F.abs(F.col("v_cents").cast("double") - F.col("med")))
    )
    return (
        base.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.first("med") / 100.0).alias("median_value"),
            (F.expr("percentile(absdev, 0.5)") / 100.0).alias("mad_value"),
        )
        .orderBy("event_type")
    )


_MAD_SQL = """
WITH b AS (
  SELECT event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS v_cents,
         quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.5)
           OVER (PARTITION BY event_type) AS med
  FROM events)
SELECT event_type, COUNT(*) AS n,
       ANY_VALUE(med) / 100.0 AS median_value,
       quantile_cont(ABS(CAST(v_cents AS DOUBLE) - med), 0.5) / 100.0
         AS mad_value
FROM b GROUP BY event_type ORDER BY event_type
"""


QUERIES = {
    "forecast_revenue": q_forecast_revenue,
    "late_shipment_priority": q_late_shipment_priority,
    "top_revenue_supplier": q_top_revenue_supplier,
    "product_type_profit": q_product_type_profit,
    "ntile_deciles": q_ntile_deciles,
    "nation_price_corr": q_nation_price_corr,
    "winsorized_stats": q_winsorized_stats,
    "null_safe_join": q_null_safe_join,
    "mad_value": q_mad_value,
}

ORACLE = {
    "forecast_revenue": _FORECAST_REVENUE_SQL,
    "late_shipment_priority": _LATE_SHIPMENT_SQL,
    "top_revenue_supplier": _TOP_SUPPLIER_SQL,
    "product_type_profit": _PRODUCT_PROFIT_SQL,
    "ntile_deciles": _NTILE_DECILES_SQL,
    "nation_price_corr": _NATION_CORR_SQL,
    "winsorized_stats": _WINSORIZED_SQL,
    "null_safe_join": _NULL_SAFE_JOIN_SQL,
    "mad_value": _MAD_SQL,
}
