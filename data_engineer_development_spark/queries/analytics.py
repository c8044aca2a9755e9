"""Engine-completeness analytics (SURVEY.md §2.4/§2.5/§2.6/§2.7/§2.8).

The reference's dims layer exists so facts join to it (export_svg.py:275-693
builds 15 decode dims); these queries exercise the join/agg/window/set-op
surface a consumer of those dims needs, over the driver's star schema.

Scale notes per query inline; shared rules:
- small dims (region 5, nation 25, supplier, part) are broadcast explicitly;
- every double aggregate goes through exact decimal accumulation (see
  functions/scalars.py) so the DuckDB oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineer_development_spark.functions import davg, dsum
from data_engineer_development_spark.operators.joins import asof_join
from data_engineer_development_spark.sources import load_table

DEC = "decimal(18,4)"


# --------------------------------------------------------------------------
# Broadcast star join: revenue per region (customer⋈nation⋈region⋈orders).
# nation/region are broadcast (≤25 rows — same shape as the reference's ≤94-row
# decode dims, export_svg.py:298-392); only orders⋈customer shuffles.
# --------------------------------------------------------------------------
def q_join_star_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "revenue"),
        )
        .orderBy("r_name")
    )


_JOIN_STAR_BROADCAST_SQL = """
SELECT r_name,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


# --------------------------------------------------------------------------
# Shipping-priority top-k (TPC-H Q3 shape): 3-way join, selective filters on
# both fact sides, group, deterministic top-10.
# --------------------------------------------------------------------------
def q_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cutoff = "1998-03-15"
    revenue = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast("decimal(5,4)") - F.col("l_discount").cast("decimal(8,4)")
    )
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue), 4).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_TOP_UNSHIPPED_ORDERS_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
            * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(8,4)))), 4) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# Local-supplier volume (TPC-H Q5 shape): 6-table star join with the
# c_nationkey = s_nationkey co-location predicate.
# --------------------------------------------------------------------------
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: load_table(spark, sf_dir, n) for n in
         ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    revenue = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast("decimal(5,4)") - F.col("l_discount").cast("decimal(8,4)")
    )
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["supplier"], (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 4).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


_LOCAL_SUPPLIER_VOLUME_SQL = """
SELECT n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
            * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(8,4)))), 4) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


# --------------------------------------------------------------------------
# Left outer join + conditional agg: order count per customer incl. zero.
# --------------------------------------------------------------------------
def q_left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


_LEFT_JOIN_ORDER_COUNTS_SQL = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey ORDER BY c_custkey
"""


# --------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS).
# --------------------------------------------------------------------------
def q_semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


_SEMI_JOIN_SQL = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def q_anti_join_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    )


_ANTI_JOIN_SQL = """
SELECT c_custkey, c_acctbal FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


# --------------------------------------------------------------------------
# Aggregation variants: count / distinct count / min / max / avg per group.
# --------------------------------------------------------------------------
def q_agg_stats_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            davg("c_acctbal", "avg_bal"),
        )
        .orderBy("n_name")
    )


_AGG_STATS_PER_NATION_SQL = """
SELECT n_name,
       COUNT(*) AS n_customers,
       COUNT(DISTINCT c_mktsegment) AS n_segments,
       MIN(c_acctbal) AS min_bal,
       MAX(c_acctbal) AS max_bal,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(20,4))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


# --------------------------------------------------------------------------
# Window: top-3 per group by rank (SURVEY §2.6 — extension; none in reference).
# --------------------------------------------------------------------------
def q_window_topk_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        customer.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_mktsegment", "rk", "c_custkey", "c_acctbal")
        .orderBy("c_mktsegment", "rk")
    )


_WINDOW_TOPK_SQL = """
SELECT c_mktsegment, rk, c_custkey, c_acctbal FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
  FROM customer
) WHERE rk <= 3 ORDER BY c_mktsegment, rk
"""


# --------------------------------------------------------------------------
# Window: running total + lag over a deterministic total order.
# Cumulative sum stays decimal per-row then casts double, so every prefix is
# exact on both engines.
# --------------------------------------------------------------------------
def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = (
        F.sum(F.col("o_totalprice").cast("decimal(20,4)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
    )
    prev = F.lag(F.col("o_totalprice")).over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        run.alias("running_spend"),
        prev.alias("prev_price"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


_WINDOW_RUNNING_TOTAL_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
       LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
FROM orders WHERE o_custkey < 50
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


# --------------------------------------------------------------------------
# Rollup (grouping sets family).
# --------------------------------------------------------------------------
def q_rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


# --------------------------------------------------------------------------
# Set operations: UNION / INTERSECT / EXCEPT (SURVEY §2.8 — extension).
# --------------------------------------------------------------------------
def q_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    with_orders = orders.select(F.col("o_custkey").alias("custkey")).distinct()
    rich = customer.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey")
    )
    both = with_orders.intersect(rich).withColumn("tag", F.lit("rich_active"))
    only_rich = rich.exceptAll(with_orders).withColumn("tag", F.lit("rich_dormant"))
    return both.unionByName(only_rich).orderBy("custkey", "tag")


_SET_OPERATIONS_SQL = """
WITH with_orders AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
     rich AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
SELECT custkey, 'rich_active' AS tag FROM (SELECT custkey FROM with_orders INTERSECT SELECT custkey FROM rich)
UNION ALL
SELECT custkey, 'rich_dormant' AS tag FROM (SELECT custkey FROM rich EXCEPT ALL SELECT custkey FROM with_orders)
ORDER BY custkey, tag
"""


# --------------------------------------------------------------------------
# As-of join (custom operator, operators/joins.py): for each non-purchase
# event, the user's most recent purchase value at/before the event time.
# Oracle: DuckDB's native ASOF JOIN.
# --------------------------------------------------------------------------
def q_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    # unique (user_id, ts) on the right for deterministic payloads
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("ts").alias("p_ts"), F.col("value").alias("purchase_value"))
    )
    out = asof_join(
        clicks,
        purchases,
        key="user_id",
        left_time="ts",
        right_time="p_ts",
        right_payload=["purchase_value"],
    )
    return out.select("event_id", "user_id", "ts", "purchase_value").orderBy("event_id")


_ASOF_LAST_PURCHASE_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, ts AS p_ts, value AS purchase_value
  FROM (SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase')
  WHERE rn = 1
)
SELECT c.event_id, c.user_id, c.ts, p.purchase_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.p_ts
ORDER BY c.event_id
"""


# --------------------------------------------------------------------------
# Last-touch attribution: each purchase is credited to the user's most
# recent click at-or-before it; revenue rolls up per attributing click DAY
# (purchases with no preceding click fall into the NULL day — unattributed
# revenue is a number marketers ask for, not a dropped row). Same
# union+forward-fill as-of plan as asof_last_purchase: one shuffle on
# user_id, no row explosion — the naive t1≤t2 join-then-max explodes to
# |clicks×purchases| per user before aggregating.
# --------------------------------------------------------------------------
def q_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), "value"
    )
    # unique (user_id, ts) on the right for deterministic as-of payloads;
    # ties collapse to one row whose payload (the click day) is identical
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts").alias("c_ts"),
            F.to_date("ts").alias("click_day"),
        )
        .dropDuplicates(["user_id", "c_ts"])
    )
    attributed = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_time="p_ts",
        right_time="c_ts",
        right_payload=["click_day"],
    )
    return (
        attributed.groupBy("click_day")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dsum("value", "attributed_value"),
        )
        .orderBy(F.col("click_day").asc_nulls_first())
    )


_CLICK_ATTRIBUTION_SQL = """
WITH purchases AS (
  SELECT user_id, ts AS p_ts, value FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT DISTINCT user_id, ts AS c_ts, CAST(date_trunc('day', ts) AS DATE) AS click_day
  FROM events WHERE event_type = 'click'
)
SELECT c.click_day,
       COUNT(*) AS n_purchases,
       CAST(SUM(CAST(p.value AS DECIMAL(20,4))) AS DOUBLE) AS attributed_value
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.p_ts >= c.c_ts
GROUP BY c.click_day
ORDER BY c.click_day ASC NULLS FIRST
"""


# --------------------------------------------------------------------------
# Linear multi-touch attribution — STAGED for r15 registration: the
# equal-split companion to last-touch click_attribution. Every click in
# the 7 days up to a purchase shares the purchase's value equally; a
# purchase with no in-window click lands whole on the NULL day (the
# unattributed bucket, same convention as click_attribution). Credit
# is EXACT integer micro-cents — value_cents·10000 div n per touch —
# because per-share IEEE division summed as doubles would be
# accumulation-order-dependent and unhashable cross-engine. Shapes: one
# user-keyed equi-join with the time-range residual (SMJ + filter,
# never cartesian), one per-purchase count, one day-keyed aggregate.
# --------------------------------------------------------------------------
def q_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.to_date("ts").alias("click_day"),
    )
    j = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
        "left",
    )
    n = j.groupBy("p_id").agg(F.count("c_ts").alias("n_touch"))
    credited = j.join(n, "p_id").select(
        "click_day",
        F.expr(
            "CASE WHEN n_touch = 0 THEN value_cents * 10000 "
            "ELSE value_cents * 10000 div n_touch END"
        ).alias("credit_micro"),
    )
    return (
        credited.groupBy("click_day")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.sum("credit_micro").alias("credit_micro"),
        )
        .orderBy(F.col("click_day").asc_nulls_first())
    )


_LINEAR_ATTRIBUTION_SQL = """
WITH p AS (
  SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts,
         CAST(ROUND(value * 100) AS BIGINT) AS value_cents
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id AS c_user, ts AS c_ts,
         CAST(date_trunc('day', ts) AS DATE) AS click_day
  FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.p_id, p.value_cents, c.click_day, c.c_ts
  FROM p LEFT JOIN c
    ON p.p_user = c.c_user AND c.c_ts <= p.p_ts
   AND c.c_ts >= p.p_ts - INTERVAL 7 DAY
), n AS (
  SELECT p_id, COUNT(c_ts) AS n_touch FROM j GROUP BY p_id
), credited AS (
  SELECT j.click_day,
         CASE WHEN n.n_touch = 0 THEN j.value_cents * 10000
              ELSE j.value_cents * 10000 // n.n_touch END AS credit_micro
  FROM j JOIN n ON j.p_id = n.p_id
)
SELECT click_day, COUNT(*) AS n_credits,
       CAST(SUM(credit_micro) AS BIGINT) AS credit_micro
FROM credited GROUP BY click_day
ORDER BY click_day ASC NULLS FIRST
"""


# --------------------------------------------------------------------------
# Market-basket association rules — STAGED for r16 registration: the
# classic co-purchase mining workload (support / confidence / lift over
# part pairs within orders). Pair generation reuses the capped per-order
# fanout discipline (≤32 distinct parts per order, deterministic, never
# binds on the fixtures) and is the ONLY super-linear step — bounded
# C(32,2) per basket; everything after runs on the PAIR-AGGREGATE table
# (support counts), orders of magnitude smaller than the input. Each
# ratio is a single IEEE division (or one multiply each side then one
# division) on exact ints — bit-identical cross-engine. A pair yields
# BOTH directed rules (x→y and y→x share support but differ in
# confidence). Registration must add the entry to _CARTESIAN_OK in
# tests/test_plans.py (the 1-row basket-count N broadcast).
# --------------------------------------------------------------------------
_AR_MINSUP = 2
_AR_CAP = 32


def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineer_development_spark.cache import track_persist

    lp = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    lp = track_persist(
        lp.withColumn(
            "rn", F.row_number().over(Window.partitionBy("o").orderBy("p"))
        )
        .filter(F.col("rn") <= _AR_CAP)
        .drop("rn")
    )
    n_baskets = lp.agg(
        F.count_distinct(F.col("o")).alias("n_baskets")
    )
    item = lp.groupBy(F.col("p").alias("item")).agg(
        F.count(F.lit(1)).alias("n_item")
    )
    # persisted: the union below reads pairs twice (one select per rule
    # direction) — without it the whole pair-generation aggregate runs
    # twice (measured 5.2 → ~3 s at sf0.1)
    pairs = track_persist(
        lp.select("o", F.col("p").alias("x"))
        .join(lp.select("o", F.col("p").alias("y")), "o")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= _AR_MINSUP)
    )
    rules = pairs.select(
        F.col("x").alias("antecedent"), F.col("y").alias("consequent"),
        "n_both",
    ).unionByName(
        pairs.select(
            F.col("y").alias("antecedent"), F.col("x").alias("consequent"),
            "n_both",
        )
    )
    return (
        rules.join(
            item.select(F.col("item").alias("antecedent"),
                        F.col("n_item").alias("n_ante")),
            "antecedent",
        )
        .join(
            item.select(F.col("item").alias("consequent"),
                        F.col("n_item").alias("n_cons")),
            "consequent",
        )
        .join(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "n_both",
            "n_ante",
            "n_cons",
            (F.col("n_both").cast("double") / F.col("n_ante").cast("double"))
            .alias("confidence"),
            # division-first: the int64 products n_both·n_baskets /
            # n_ante·n_cons overflow at 100 TB basket counts (review
            # r15 — the r14 histogram-binning overflow class). The
            # denominators are canonicalized least/greatest so BOTH
            # rule directions run the identical three-op IEEE sequence
            # — lift stays bit-exactly symmetric (a naive
            # (n/na)·(N/nc) rounds differently per direction)
            (
                (
                    F.col("n_both").cast("double")
                    / F.least("n_ante", "n_cons").cast("double")
                )
                * (
                    F.col("n_baskets").cast("double")
                    / F.greatest("n_ante", "n_cons").cast("double")
                )
            ).alias("lift"),
        )
        .orderBy("antecedent", "consequent")
    )


_ASSOC_RULES_SQL = f"""
WITH lp0 AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
lp AS (SELECT o, p FROM
         (SELECT o, p, ROW_NUMBER() OVER (PARTITION BY o ORDER BY p) AS rn
          FROM lp0)
       WHERE rn <= {_AR_CAP}),
nb AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_baskets FROM lp),
item AS (SELECT p AS item, CAST(COUNT(*) AS BIGINT) AS n_item
         FROM lp GROUP BY p),
pairs AS (SELECT a.p AS x, b.p AS y, CAST(COUNT(*) AS BIGINT) AS n_both
          FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p
          GROUP BY a.p, b.p HAVING COUNT(*) >= {_AR_MINSUP}),
rules AS (SELECT x AS antecedent, y AS consequent, n_both FROM pairs
          UNION ALL
          SELECT y, x, n_both FROM pairs)
SELECT r.antecedent, r.consequent, r.n_both,
       ia.n_item AS n_ante, ic.n_item AS n_cons,
       CAST(r.n_both AS DOUBLE) / CAST(ia.n_item AS DOUBLE) AS confidence,
       (CAST(r.n_both AS DOUBLE)
          / CAST(LEAST(ia.n_item, ic.n_item) AS DOUBLE))
         * (CAST(nb.n_baskets AS DOUBLE)
              / CAST(GREATEST(ia.n_item, ic.n_item) AS DOUBLE)) AS lift
FROM rules r
JOIN item ia ON ia.item = r.antecedent
JOIN item ic ON ic.item = r.consequent
CROSS JOIN nb
ORDER BY r.antecedent, r.consequent
"""


QUERIES = {
    "join_star_broadcast": q_join_star_broadcast,
    "top_unshipped_orders": q_top_unshipped_orders,
    "local_supplier_volume": q_local_supplier_volume,
    "left_join_order_counts": q_left_join_order_counts,
    "semi_join_active_customers": q_semi_join_active_customers,
    "anti_join_dormant_customers": q_anti_join_dormant_customers,
    "agg_stats_per_nation": q_agg_stats_per_nation,
    "window_topk_per_segment": q_window_topk_per_segment,
    "window_running_total": q_window_running_total,
    "rollup_status_priority": q_rollup_status_priority,
    "set_operations": q_set_operations,
    "asof_last_purchase": q_asof_last_purchase,
    "click_attribution": q_click_attribution,
    # registered r15 (staged r14, tri-SF + ANSI-on parity on record)
    "linear_attribution": q_linear_attribution,
    # registered r16 (staged r15, tri-SF + ANSI-on parity on record)
    "assoc_rules": q_assoc_rules,
}

ORACLE = {
    "assoc_rules": _ASSOC_RULES_SQL,
    "linear_attribution": _LINEAR_ATTRIBUTION_SQL,
    "join_star_broadcast": _JOIN_STAR_BROADCAST_SQL,
    "top_unshipped_orders": _TOP_UNSHIPPED_ORDERS_SQL,
    "local_supplier_volume": _LOCAL_SUPPLIER_VOLUME_SQL,
    "left_join_order_counts": _LEFT_JOIN_ORDER_COUNTS_SQL,
    "semi_join_active_customers": _SEMI_JOIN_SQL,
    "anti_join_dormant_customers": _ANTI_JOIN_SQL,
    "agg_stats_per_nation": _AGG_STATS_PER_NATION_SQL,
    "window_topk_per_segment": _WINDOW_TOPK_SQL,
    "window_running_total": _WINDOW_RUNNING_TOTAL_SQL,
    "rollup_status_priority": _ROLLUP_SQL,
    "set_operations": _SET_OPERATIONS_SQL,
    "asof_last_purchase": _ASOF_LAST_PURCHASE_SQL,
    "click_attribution": _CLICK_ATTRIBUTION_SQL,
}
