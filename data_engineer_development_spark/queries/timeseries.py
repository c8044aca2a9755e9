"""Event-time windowing over the `events` table (SURVEY.md §2.10 extension).

The reference has no streaming/windowing surface (its only stream-flavored
code publishes 2 daily Pub/Sub commands, transfer_sercom_files.py:102-123);
these are the batch duals of the Structured Streaming operators in
streaming/ — same window semantics, expressed so a DuckDB oracle can verify
them. The streaming variants (readStream + watermark) reuse the identical
aggregation expressions.

Scale: tumbling/sliding windows are pure hash aggregations (one shuffle on
the window+type key). Session windows use Spark's built-in session_window
aggregation — at 100 TB the partitionBy(user) shuffle is the cost, identical
to any per-user op; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineer_development_spark.functions import dsum
from data_engineer_development_spark.sources import load_table


# --------------------------------------------------------------------------
# Tumbling 1-hour windows per event_type.
# --------------------------------------------------------------------------
def q_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


_TUMBLING_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# Sliding windows: 1-hour length, 30-minute slide ⇒ each event lands in two
# windows. Oracle: UNION ALL over the two 30-min-grid buckets each row maps
# to (time_bucket is epoch-aligned like Spark's window()).
# --------------------------------------------------------------------------
def q_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
        .orderBy("window_start")
    )


_SLIDING_HOURLY_SQL = """
WITH assigned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value FROM events
)
SELECT window_start, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS total_value
FROM assigned GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# Session windows: 10-minute inactivity gap per user. Spark's built-in
# session_window vs a gaps-and-islands oracle (lag + cumulative boundary sum).
# Spark session end = last event + gap; report start/end/n/total per session.
# --------------------------------------------------------------------------
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    return (
        ev.groupBy("user_id", F.session_window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


_SESSION_WINDOWS_SQL = """
WITH e AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '10 minutes'
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS boundary
  FROM events WHERE user_id < 20
), s AS (
  SELECT user_id, ts, value,
         SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM e
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '10 minutes' AS session_end,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS total_value
FROM s GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


# --------------------------------------------------------------------------
# Time-bucketed dense output: daily event counts (F7 date-bucket analogue,
# transfer_sercom_files.py:32-34 dated-filename pattern).
# --------------------------------------------------------------------------
def q_daily_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy_MM_dd").alias("day_tag"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("day_tag")
    )


_DAILY_BUCKETS_SQL = """
SELECT strftime(ts, '%Y_%m_%d') AS day_tag, COUNT(*) AS n
FROM events GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# Streaming dedup: dropDuplicates over a keyed stream. WHICH physical row
# survives depends on arrival order, so the checked output is the
# arrival-order-independent part — distinct (user, type) existence — counted
# per type. This is the streaming path of exact dedup (operators/dedup.py):
# state is one entry per distinct key, evicted by the watermark.
# --------------------------------------------------------------------------
def q_stream_dedup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid as _uuid

    from data_engineer_development_spark.streaming import stream_events
    from data_engineer_development_spark.streaming.windows import (
        run_to_memory_sink,
    )

    deduped = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "1 day")
        .dropDuplicates(["user_id", "event_type"])
    )
    name = f"q_dedup_{_uuid.uuid4().hex[:8]}"
    # 1-day watermark would drop "late" rows if the source ever split into
    # multiple micro-batches — fail loudly instead of returning a subset.
    # state_partitions=4: dedup state is one row per (user, type) — tiny —
    # and every micro-batch pays a per-partition state-store open/commit,
    # so fewer partitions win until state outgrows them.
    # no_data_batches=False: append-mode dropDuplicates emits each key on
    # FIRST sight, in the data batch — the trailing empty batch only
    # evicts expired state, with zero output effect.
    run_to_memory_sink(
        deduped, name, output_mode="append", assert_single_batch=True,
        state_partitions=4, no_data_batches=False,
    )
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("event_type")
    )


_STREAM_DEDUP_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Stream-static enrichment join: the live event stream joined to the
# customer→nation dimension (broadcast — the dim is static and bounded), a
# keyed aggregate on top. Complete-mode state is O(#nations × #types).
# AvailableNow drains the whole source, so the final table equals the batch
# join — which is the oracle.
# --------------------------------------------------------------------------
def q_stream_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid as _uuid

    from data_engineer_development_spark.streaming import stream_events
    from data_engineer_development_spark.streaming.windows import (
        run_to_memory_sink,
    )

    ev = stream_events(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dim = F.broadcast(
        cust.join(nat, cust.c_nationkey == nat.n_nationkey).select(
            "c_custkey", "n_name"
        )
    )
    agg = (
        ev.join(dim, ev.user_id == dim.c_custkey)
        .groupBy("n_name", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))
    )
    name = f"q_enrich_{_uuid.uuid4().hex[:8]}"
    # complete-mode state is O(#nations × #types) ≈ 150 rows — 4 state
    # partitions bound the per-batch store open/commit cost.
    # no_data_batches=False: complete mode rewrites the full sink table
    # after every DATA batch; the trailing empty batch re-emits the
    # identical table (no watermark in the plan), pure constant cost.
    run_to_memory_sink(
        agg, name, output_mode="complete", state_partitions=4,
        no_data_batches=False,
    )
    return spark.table(name).orderBy("n_name", "event_type")


_STREAM_ENRICH_SQL = """
SELECT n_name, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS total_value
FROM events
JOIN customer ON user_id = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# Stream-stream interval join: clicks joined to purchases by the same user
# within the following hour. Both sides carry watermarks (which bound the
# join state — Spark evicts buffered rows once the other side's watermark
# passes the interval), and the time predicate rides the user_id equi-join.
# The joined append stream is arrival-order independent, so the batch
# interval join is the oracle.
# --------------------------------------------------------------------------
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid as _uuid

    from data_engineer_development_spark.streaming import stream_events
    from data_engineer_development_spark.streaming.windows import (
        run_to_memory_sink,
    )

    # The user slice bounds join-state volume (it prunes at the scan); the
    # operator semantics under test are unchanged — at production scale the
    # watermark, not a filter, is what bounds state.
    clicks = (
        stream_events(spark, sf_dir)
        .filter((F.col("event_type") == "click") & (F.col("user_id") < 200))
        .withWatermark("ts", "1 day")
        .select("user_id", F.col("ts").alias("c_ts"))
    )
    purchases = (
        stream_events(spark, sf_dir)
        .filter(
            (F.col("event_type") == "purchase") & (F.col("user_id") < 200)
        )
        .withWatermark("ts", "1 day")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("user_id", "c_ts", "p_ts")
    name = f"q_ssj_{_uuid.uuid4().hex[:8]}"
    # same watermark-vs-late-rows exactness contract as stream_dedup_users.
    # state_partitions=2: both join sides buffer only the 200-user slice, so
    # per-batch state-store open/commit dominates — measured at sf0.1
    # min-of-3: 2.24 s @4 → 1.87 s @2 (1.95 s @1); at production state
    # volume this knob scales back up per stream. no_data_batches=False:
    # INNER stream-stream joins emit on match, so the trailing empty
    # watermark-advance batch is pure state-eviction cost (~0.7 s) with
    # zero output effect — an outer join would need it.
    run_to_memory_sink(
        joined, name, output_mode="append", assert_single_batch=True,
        state_partitions=2, no_data_batches=False,
    )
    return spark.table(name).orderBy("user_id", "c_ts", "p_ts")


_STREAM_STREAM_JOIN_SQL = """
SELECT c.user_id, c.ts AS c_ts, p.ts AS p_ts
FROM events c JOIN events p
  ON p.user_id = c.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
  AND c.user_id < 200 AND p.user_id < 200
ORDER BY c.user_id, c_ts, p_ts
"""


# --------------------------------------------------------------------------
# Gap filling: the dense (event_type × day) grid with zero-filled missing
# days — what a monitoring/forecasting consumer needs from a sparse daily
# rollup. The day spine is generated from the global [min, max] date pair
# (a 1-row broadcast), crossed with the distinct type dim — both
# metadata-scale, so the "cross join" is a tiny dimension grid, never
# data×data; the fact side then LEFT-joins onto the grid by its key.
# --------------------------------------------------------------------------
def q_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n")
    )
    bounds = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    days = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 day"))
        ).alias("day")
    )
    types = daily.select("event_type").distinct()
    grid = days.crossJoin(F.broadcast(types))
    return (
        grid.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type", "day", F.coalesce("n", F.lit(0)).alias("n")
        )
        .orderBy("event_type", "day")
    )


_GAPFILL_SQL = """
WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
               FROM events GROUP BY 1, 2),
b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
days AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                AS day
         FROM b),
types AS (SELECT DISTINCT event_type FROM daily)
SELECT t.event_type, d.day, COALESCE(daily.n, 0) AS n
FROM days d CROSS JOIN types t
LEFT JOIN daily ON daily.event_type = t.event_type AND daily.day = d.day
ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# dropDuplicatesWithinWatermark (Spark 4 streaming dedup with BOUNDED
# state): unlike dropDuplicates — whose per-key state lives forever unless
# the key column set includes the event-time column — the WithinWatermark
# variant evicts a key's state once the watermark passes its first-seen
# timestamp, which is the only dedup whose state is bounded on an
# unbounded stream. With the whole source draining in one micro-batch and
# a 1-day delay, nothing is evicted mid-run, so the output equals exact
# distinct — which is what the oracle pins (the arrival-order-independent
# projection of it, counted per type).
# --------------------------------------------------------------------------
def q_stream_dedup_within_watermark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import uuid as _uuid

    from data_engineer_development_spark.streaming import stream_events
    from data_engineer_development_spark.streaming.windows import (
        run_to_memory_sink,
    )

    deduped = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    name = f"q_ddww_{_uuid.uuid4().hex[:8]}"
    run_to_memory_sink(
        deduped, name, output_mode="append", assert_single_batch=True,
        state_partitions=4,
    )
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("event_type")
    )


_STREAM_DDWW_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Exact rolling median (7-row trailing window per user) — the robust
# smoother for noisy telemetry (a rolling MEAN is wrecked by one spike).
# Values are scaled to integer cents first: both engines then interpolate
# the median as exact half-integers (Spark computes lo+(hi-lo)*0.5, DuckDB
# (lo+hi)/2 — identical doubles ONLY because the operands are integers;
# on raw doubles the two formulas can differ in the last ulp). The ROWS
# frame is made deterministic by the (ts, event_id) total order.
# Scale: one shuffle on user_id; the per-row percentile re-sorts only a
# 7-element frame.
# --------------------------------------------------------------------------
def q_rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    cents = F.round(F.col("value") * 100).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    med = F.expr("percentile(v_cents, 0.5)")
    return (
        ev.withColumn("v_cents", cents)
        .withColumn("med_cents", med.over(w))
        .select(
            "event_id",
            "user_id",
            (F.col("med_cents") / 100.0).alias("rolling_median"),
        )
        .orderBy("event_id")
    )


_ROLLING_MEDIAN_SQL = """
SELECT event_id, user_id,
       quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.5) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) / 100.0 AS rolling_median
FROM events WHERE user_id < 100
ORDER BY event_id
"""


QUERIES = {
    "tumbling_hourly": q_tumbling_hourly,
    "sliding_hourly": q_sliding_hourly,
    "session_windows": q_session_windows,
    "daily_buckets": q_daily_buckets,
    "stream_dedup_users": q_stream_dedup_users,
    "stream_enrich_join": q_stream_enrich_join,
    "stream_stream_join": q_stream_stream_join,
    "gapfill_daily": q_gapfill_daily,
    "stream_dedup_within_watermark": q_stream_dedup_within_watermark,
    "rolling_median_value": q_rolling_median_value,
}

ORACLE = {
    "tumbling_hourly": _TUMBLING_HOURLY_SQL,
    "sliding_hourly": _SLIDING_HOURLY_SQL,
    "session_windows": _SESSION_WINDOWS_SQL,
    "daily_buckets": _DAILY_BUCKETS_SQL,
    "stream_dedup_users": _STREAM_DEDUP_SQL,
    "stream_enrich_join": _STREAM_ENRICH_SQL,
    "stream_stream_join": _STREAM_STREAM_JOIN_SQL,
    "gapfill_daily": _GAPFILL_SQL,
    "stream_dedup_within_watermark": _STREAM_DDWW_SQL,
    "rolling_median_value": _ROLLING_MEDIAN_SQL,
}
