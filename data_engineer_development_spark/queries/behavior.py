"""Behavioral event analytics: funnel conversion and cohort retention —
the two canonical event-table workloads a warehouse engine must run well.

Both are keyed-aggregate shapes: per-user reductions (one hash shuffle on
user_id) followed by a small date-keyed rollup. At 100 TB the user_id
shuffle is the cost and it's unavoidable-but-linear; nothing here is
quadratic and nothing collects to the driver. Timestamp arithmetic stays
in microseconds (the nanos→micros truncation both engines apply to the
events table) so the oracle agrees bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineer_development_spark.sources import load_table

_CONV_HOURS = 72


# --------------------------------------------------------------------------
# Funnel: first signup → first purchase at-or-after it; conversion within
# 72 h, rolled up by signup date. The purchase side is pre-reduced per user
# AFTER the equi-join on user_id (the time predicate rides the join), so
# the shuffle carries user-level rows, never the event×event product.
# --------------------------------------------------------------------------
def q_funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    per_user = (
        signups.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("t_signup")),
            "left",
        )
        .groupBy("user_id", "t_signup")
        .agg(F.min("p_ts").alias("t_first_purchase"))
    )
    return (
        per_user.groupBy(F.to_date("t_signup").alias("signup_date"))
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.count("t_first_purchase").alias("n_purchased"),
            F.sum(
                F.when(
                    F.col("t_first_purchase")
                    <= F.col("t_signup")
                    + F.expr(f"INTERVAL {_CONV_HOURS} HOURS"),
                    1,
                ).otherwise(0)
            ).alias("n_converted_72h"),
        )
        .orderBy("signup_date")
    )


_FUNNEL_SQL = f"""
WITH signups AS (SELECT user_id, MIN(ts) AS t_signup FROM events
                 WHERE event_type = 'signup' GROUP BY user_id),
per_user AS (SELECT s.user_id, s.t_signup, MIN(p.ts) AS t_first_purchase
             FROM signups s
             LEFT JOIN events p ON p.user_id = s.user_id
                  AND p.event_type = 'purchase' AND p.ts >= s.t_signup
             GROUP BY s.user_id, s.t_signup)
SELECT CAST(t_signup AS DATE) AS signup_date,
       COUNT(*) AS n_signups,
       COUNT(t_first_purchase) AS n_purchased,
       CAST(SUM(CASE WHEN t_first_purchase
                          <= t_signup + INTERVAL {_CONV_HOURS} HOUR
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted_72h
FROM per_user GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# Cohort retention triangle: users by first-seen date × day offset. The
# distinct (user, day) reduction collapses raw volume before anything else
# — at 100 TB that first aggregate is the whole cost; the triangle itself
# is #cohorts × #offsets rows.
# --------------------------------------------------------------------------
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    act = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    first = act.groupBy("user_id").agg(F.min("d").alias("cohort"))
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort", F.datediff(F.col("d"), F.col("cohort")).alias("day_offset")
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort", "day_offset")
    )


_RETENTION_SQL = """
WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
first AS (SELECT user_id, MIN(d) AS cohort FROM act GROUP BY user_id)
SELECT f.cohort, date_diff('day', f.cohort, a.d) AS day_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM act a JOIN first f ON a.user_id = f.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# Latest record per key — the "resolved view" shape (same physics as the
# KV store's read path, kv.py): one window over the key, keep rank 1.
# Tie-break pins event_id so the survivor is deterministic.
# --------------------------------------------------------------------------
def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
        .orderBy("user_id")
    )


_LATEST_EVENT_SQL = """
SELECT user_id, event_id, ts, event_type
FROM (SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1 ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Salted two-phase aggregation, oracle-proven equivalent to the plain
# GROUP BY. The salt spreads a hot key over 16 reducers (phase 1), the
# merge re-combines partials (phase 2) — the standard skewed-group-by fix
# (operators/joins.py salted_agg), here shown to preserve semantics
# exactly: counts merge by SUM, decimal sums merge by SUM, so the result
# is bit-identical to the one-shuffle plan no matter how rows were salted.
# --------------------------------------------------------------------------
def q_salted_agg_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineer_development_spark.functions.scalars import DEC
    from data_engineer_development_spark.operators.joins import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).alias("sum_value"),
        ],
        salt_buckets=16,
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_value").cast("double").alias("sum_value"),
    ).orderBy("event_type")


_SALTED_AGG_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Link analysis: integer-exact PageRank (operators/graph.py) over the
# customer↔supplier interaction graph (DISTINCT trading pairs from
# orders⋈lineitem, both directions — supplier ids offset by 1e6 into a
# shared node space). 3 fixed rounds, damping 0.85, all arithmetic in
# scaled BIGINTs with truncating division so result is independent of
# partitioning/aggregation order — what makes an iterative float algorithm
# hash-checkable. Oracle: the same three rounds unrolled as CTEs.
# --------------------------------------------------------------------------
_PR_OFFSET = 1_000_000
_PR_TOPK = 20


def _trading_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected customer↔supplier trading edges (both directions), the
    shared graph under supplier_pagerank and trading_communities:
    distinct (custkey, suppkey + _PR_OFFSET) pairs from orders ⋈
    lineitem, doubled src↔dst."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("c"),
            (F.col("l_suppkey") + F.lit(_PR_OFFSET)).cast("long").alias("s"),
        )
        .distinct()
    )
    return pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).union(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))


#: the same graph as DuckDB CTEs (pairs, und) — shared by both oracles
_TRADING_GRAPH_CTES = f"""pairs AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS c,
                  CAST(l_suppkey + {_PR_OFFSET} AS BIGINT) AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
und AS (SELECT c AS src, s AS dst FROM pairs
        UNION ALL SELECT s, c FROM pairs)"""


def q_supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineer_development_spark.operators.graph import pagerank

    und = _trading_graph(spark, sf_dir)
    ranks = pagerank(und, iterations=3)
    return (
        ranks.orderBy(F.col("rank").desc(), "id")
        .limit(_PR_TOPK)
        .select(F.col("id").alias("node_id"), "rank")
    )


_PAGERANK_SQL = f"""
WITH {_TRADING_GRAPH_CTES},
deg AS (SELECT src, COUNT(*) AS deg FROM und GROUP BY src),
nodes AS (SELECT DISTINCT src AS id FROM und),
r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank FROM nodes),
r1 AS (SELECT n.id,
              CAST(150000 + COALESCE(SUM((85 * r.rank) // (100 * d.deg)), 0)
                   AS BIGINT) AS rank
       FROM nodes n
       LEFT JOIN und ON und.dst = n.id
       LEFT JOIN r0 r ON r.id = und.src
       LEFT JOIN deg d ON d.src = und.src
       GROUP BY n.id),
r2 AS (SELECT n.id,
              CAST(150000 + COALESCE(SUM((85 * r.rank) // (100 * d.deg)), 0)
                   AS BIGINT) AS rank
       FROM nodes n
       LEFT JOIN und ON und.dst = n.id
       LEFT JOIN r1 r ON r.id = und.src
       LEFT JOIN deg d ON d.src = und.src
       GROUP BY n.id),
r3 AS (SELECT n.id,
              CAST(150000 + COALESCE(SUM((85 * r.rank) // (100 * d.deg)), 0)
                   AS BIGINT) AS rank
       FROM nodes n
       LEFT JOIN und ON und.dst = n.id
       LEFT JOIN r2 r ON r.id = und.src
       LEFT JOIN deg d ON d.src = und.src
       GROUP BY n.id)
SELECT id AS node_id, rank FROM r3
ORDER BY rank DESC, id LIMIT {_PR_TOPK}
"""


# --------------------------------------------------------------------------
# Trading communities — STAGED for r14+ registration: deterministic label
# propagation (operators/graph.label_propagation) over the same
# customer↔supplier trading graph supplier_pagerank ranks. Communities
# answer the question pagerank/connected-components don't: WHICH groups
# of customers and suppliers trade mostly with each other (market
# segmentation of the order flow); on the dedup side the same operator
# coarse-clusters near-dup graphs whose exact components are too big.
# Output is the community-size histogram plus each community's smallest
# member — one row per community, integer-exact. Oracle: the 3 rounds
# unrolled as MATERIALIZED CTEs (the emb_top_direction lesson: without
# the hint DuckDB re-inlines each round's dependencies exponentially).
# --------------------------------------------------------------------------
def q_trading_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineer_development_spark.operators.graph import (
        label_propagation,
    )

    und = _trading_graph(spark, sf_dir)
    nodes = und.select(F.col("src").alias("id")).distinct()
    # und already carries both directions — skip the operator's default
    # symmetrization shuffle
    labels = label_propagation(
        nodes, und, "id", "src", "dst", iterations=3, symmetrize=False
    )
    return (
        labels.groupBy(F.col("lbl").alias("community"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("node").alias("min_node"),
        )
        .orderBy("community")
    )


def _trading_communities_sql() -> str:
    rounds = []
    prev = "l0"
    for r in range(1, 4):
        rounds.append(f"""
l{r} AS MATERIALIZED (
  SELECT node, lbl FROM (
    SELECT node, lbl,
           ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
    FROM (SELECT node, lbl, COUNT(*) AS c
          FROM (SELECT und.dst AS node, l.lbl
                FROM und JOIN {prev} l ON l.node = und.src
                UNION ALL SELECT node, lbl FROM {prev})
          GROUP BY node, lbl))
  WHERE rn = 1)""")
        prev = f"l{r}"
    graph_ctes = _TRADING_GRAPH_CTES.replace(
        "pairs AS (", "pairs AS MATERIALIZED ("
    ).replace("und AS (", "und AS MATERIALIZED (")
    return f"""
WITH {graph_ctes},
l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM und),
{','.join(rounds)}
SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_members,
       MIN(node) AS min_node
FROM l3 GROUP BY lbl ORDER BY community
"""


# --------------------------------------------------------------------------
# Batch gap sessionization — STAGED for r16 registration: the classic
# event-table operator the engine so far covers only in streaming form
# (streaming/windows.session_windows is state-store sessionization at
# ingest; this is the WAREHOUSE replay over history — rebuilding every
# session ever, e.g. to backfill a metric the stream never computed).
# Per user, a new session starts when the gap since the previous event
# exceeds 30 min; sessions then reduce to per-user stats. Every window
# is PARTITIONED BY user_id (the scale contract: one hash shuffle on
# the user key, each user's slice sorts independently — never a global
# sort), and time arithmetic stays in int64 microseconds
# (unix_micros / epoch_us) so both engines agree bit-for-bit.
# --------------------------------------------------------------------------
_SESSION_GAP_US = 30 * 60 * 1_000_000


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = ev.withColumn("prev_us", F.lag("us").over(w)).withColumn(
        "new_s",
        F.when(
            F.col("prev_us").isNull()
            | ((F.col("us") - F.col("prev_us")) > _SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sid",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_session = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_ev"),
        (F.max("us") - F.min("us")).alias("dur_us"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_ev").alias("n_events"),
            F.max("n_ev").alias("max_session_events"),
            F.sum("dur_us").alias("active_us"),
        )
        .orderBy("user_id")
    )


_SESSIONIZE_SQL = f"""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
m AS (SELECT user_id, event_id, us,
             CASE WHEN LAG(us) OVER w IS NULL THEN 1
                  WHEN us - LAG(us) OVER w > {_SESSION_GAP_US} THEN 1
                  ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
s AS (SELECT user_id, us,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM m),
per AS (SELECT user_id, sid, COUNT(*) AS n_ev, MAX(us) - MIN(us) AS dur_us
        FROM s GROUP BY user_id, sid)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_ev) AS BIGINT) AS n_events,
       CAST(MAX(n_ev) AS BIGINT) AS max_session_events,
       CAST(SUM(dur_us) AS BIGINT) AS active_us
FROM per GROUP BY user_id ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Triangle count — STAGED for r16 registration: graph-structure analytics
# over the part co-purchase graph (parts sharing an order are connected;
# triangles measure clustering, the base signal for community density and
# recommendation strength). The ENGINE side runs degree-ordered
# orientation (operators/graph.count_triangles — O(m^1.5) worst-case
# wedge work, celebrity-skew-proof by construction); the oracle counts
# the same triangles by brute three-way self-join, tractable only at
# fixture scale — the quadratic lives in DuckDB, never in the engine
# (the image_ahash_neardup discipline). Edge generation caps each
# order's distinct parts at the 32 lowest (deterministic; never binds on
# the fixtures — sf0.1 max is 17 — but bounds the per-order C(L,2)
# fanout against a pathological mega-order at 100 TB), mirrored exactly
# in the oracle. Registration must add the entry to _CARTESIAN_OK in
# tests/test_plans.py (the 1-row n_nodes × n_edges × n_triangles stat
# crosses at the top of count_triangles — never data-scale).
# --------------------------------------------------------------------------
_TRI_CAP = 32


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from data_engineer_development_spark.operators.graph import (
        count_triangles,
    )

    lp = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    capped = (
        lp.withColumn(
            "rn", F.row_number().over(Window.partitionBy("o").orderBy("p"))
        )
        .filter(F.col("rn") <= _TRI_CAP)
        .drop("rn")
    )
    edges = (
        capped.select("o", F.col("p").alias("src"))
        .join(capped.select("o", F.col("p").alias("dst")), "o")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
    )
    return count_triangles(edges)


_TRIANGLE_SQL = f"""
WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
cap AS (SELECT o, p FROM
          (SELECT o, p, ROW_NUMBER() OVER (PARTITION BY o ORDER BY p) AS rn
           FROM lp)
        WHERE rn <= {_TRI_CAP}),
e AS (SELECT DISTINCT a.p AS x, b.p AS y
      FROM cap a JOIN cap b ON a.o = b.o AND a.p < b.p),
deg AS (SELECT n FROM (SELECT x AS n FROM e UNION ALL SELECT y FROM e)
        GROUP BY n),
tri AS (SELECT COUNT(*) AS n_triangles
        FROM e e1
        JOIN e e2 ON e2.x = e1.x AND e2.y > e1.y
        JOIN e e3 ON e3.x = e1.y AND e3.y = e2.y)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       CAST(tri.n_triangles AS BIGINT) AS n_triangles
FROM tri
"""


# --------------------------------------------------------------------------
# Event transition matrix — STAGED for r16 registration: the first-order
# Markov view of user behavior (P(next event type | current), the
# population-level sequence model behind churn prediction and
# next-action recommendation). Per user, each event pairs with its
# successor via lead() over a PARTITIONED window (one user_id shuffle,
# the behavior-family contract); the transition counts then collapse to
# a ≤|types|² matrix — 25 rows here — so the probability division
# happens on a control-plane-sized frame. p is one IEEE division of two
# exact int64 counts, bit-identical cross-engine.
# --------------------------------------------------------------------------
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    steps = ev.withColumn("nxt", F.lead("event_type").over(w)).filter(
        F.col("nxt").isNotNull()
    )
    cnt = steps.groupBy(
        F.col("event_type").alias("cur"), F.col("nxt")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("cur").agg(F.sum("n").alias("n_cur"))
    return (
        cnt.join(tot, "cur")
        .select(
            "cur",
            "nxt",
            "n",
            "n_cur",
            (F.col("n").cast("double") / F.col("n_cur").cast("double"))
            .alias("p"),
        )
        .orderBy("cur", "nxt")
    )


_EVENT_TRANSITIONS_SQL = """
WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
           FROM events),
s AS (SELECT event_type AS cur,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY us, event_id) AS nxt
      FROM e),
cnt AS (SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n FROM s
        WHERE nxt IS NOT NULL GROUP BY cur, nxt),
tot AS (SELECT cur, CAST(SUM(n) AS BIGINT) AS n_cur FROM cnt GROUP BY cur)
SELECT c.cur, c.nxt, c.n, t.n_cur,
       CAST(c.n AS DOUBLE) / CAST(t.n_cur AS DOUBLE) AS p
FROM cnt c JOIN tot t ON t.cur = c.cur
ORDER BY c.cur, c.nxt
"""


QUERIES = {
    "funnel_signup_purchase": q_funnel_signup_purchase,
    "retention_cohorts": q_retention_cohorts,
    "latest_event_per_user": q_latest_event_per_user,
    "salted_agg_event_types": q_salted_agg_event_types,
    "supplier_pagerank": q_supplier_pagerank,
    # registered r14 (staged r13, tri-SF + ANSI-on parity on record)
    "trading_communities": q_trading_communities,
    # registered r16 (staged r15, tri-SF + ANSI-on parity on record):
    # the warehouse behavior-replay trio — batch sessionization, the
    # triangle clustering signal, and the first-order transition matrix
    "sessionize_events": q_sessionize_events,
    "triangle_count": q_triangle_count,
    "event_transitions": q_event_transitions,
}

ORACLE = {
    "sessionize_events": _SESSIONIZE_SQL,
    "triangle_count": _TRIANGLE_SQL,
    "event_transitions": _EVENT_TRANSITIONS_SQL,
    "trading_communities": _trading_communities_sql(),
    "funnel_signup_purchase": _FUNNEL_SQL,
    "retention_cohorts": _RETENTION_SQL,
    "latest_event_per_user": _LATEST_EVENT_SQL,
    "salted_agg_event_types": _SALTED_AGG_SQL,
    "supplier_pagerank": _PAGERANK_SQL,
}
