"""Warehouse maintenance operators: SCD type-2 merge, row-level data
quality rules with quarantine buckets, and value-distribution histograms.

These extend the reference's truncate-and-reload warehouse (export_svg.py
CTAS dims; the quality zone's sentinel cleansing) with the stateful /
diagnostic operators a production deployment grows into: versioned
dimensions, rule-tagged quarantine, and distribution monitoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineer_development_spark.sources import load_table, register_views


# --------------------------------------------------------------------------
# SCD2 merge: the customer dim versioned on (mktsegment, acctbal). The
# "current" state and the "update" snapshot are both derived
# deterministically from the customer table (keys < 800 are current;
# keys < 1000 are in the snapshot with every 7th acctbal bumped), so the
# DuckDB oracle can replay the exact merge outcome: every 7th key closes
# 2024-01-01→2024-06-01 and re-opens, keys 800-999 insert fresh, the rest
# pass through untouched. One full-outer join + unions — scale-safe.
# --------------------------------------------------------------------------
_SCD_EFF = "2024-06-01"
_SCD_START = "2024-01-01"
_SCD_CUR = 800
_SCD_SNAP = 1000


def q_scd2_customer_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineer_development_spark.operators.scd import scd2_apply

    cust = load_table(spark, sf_dir, "customer")
    current = cust.filter(F.col("c_custkey") < _SCD_CUR).select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.lit(_SCD_START).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    updates = cust.filter(F.col("c_custkey") < _SCD_SNAP).select(
        "c_custkey",
        "c_mktsegment",
        F.when(
            F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + F.lit(100.0)
        )
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    return scd2_apply(
        current,
        updates,
        "c_custkey",
        ["c_mktsegment", "c_acctbal"],
        _SCD_EFF,
    ).orderBy("c_custkey", "valid_from")


_SCD2_SQL = f"""
WITH current AS (
  SELECT c_custkey, c_mktsegment, c_acctbal,
         DATE '{_SCD_START}' AS valid_from, CAST(NULL AS DATE) AS valid_to
  FROM customer WHERE c_custkey < {_SCD_CUR}),
updates AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
              ELSE c_acctbal END AS c_acctbal
  FROM customer WHERE c_custkey < {_SCD_SNAP}),
j AS (SELECT c.c_custkey AS ck, u.c_custkey AS uk,
             c.c_mktsegment AS cm, c.c_acctbal AS cb,
             u.c_mktsegment AS um, u.c_acctbal AS ub,
             c.valid_from AS vf
      FROM current c FULL JOIN updates u ON c.c_custkey = u.c_custkey),
changed AS (SELECT *, ck IS NOT NULL AND uk IS NOT NULL
                      AND (cm IS DISTINCT FROM um OR cb IS DISTINCT FROM ub)
                      AS chg
            FROM j)
SELECT ck AS c_custkey, cm AS c_mktsegment, cb AS c_acctbal,
       vf AS valid_from, CAST(NULL AS DATE) AS valid_to
FROM changed WHERE ck IS NOT NULL AND NOT chg
UNION ALL
SELECT ck, cm, cb, vf, DATE '{_SCD_EFF}' FROM changed WHERE chg
UNION ALL
SELECT uk, um, ub, DATE '{_SCD_EFF}', CAST(NULL AS DATE)
FROM changed WHERE chg OR ck IS NULL
ORDER BY c_custkey, valid_from
"""


# --------------------------------------------------------------------------
# Row-level rule validation: each row is tagged with the comma-joined list
# of rules it violates ('' = clean), then counted per violation signature —
# the quarantine-split diagnostic. concat_ws skips NULLs in both engines,
# so the same CASE chain runs verbatim as the oracle. Pure projection +
# one keyed aggregate; the rules evaluate at scan speed inside codegen.
# --------------------------------------------------------------------------
_QUARANTINE_SQL = """
SELECT concat_ws(',',
         CASE WHEN l_quantity > 45 THEN 'qty_gt45' END,
         CASE WHEN l_discount > 0.08 THEN 'disc_gt8pct' END,
         CASE WHEN l_tax > 0.06 THEN 'tax_gt6pct' END) AS violations,
       COUNT(*) AS n
FROM lineitem GROUP BY 1 ORDER BY 1
"""


def q_rule_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(_QUARANTINE_SQL)


# --------------------------------------------------------------------------
# Value-distribution histogram (fixed-width buckets by floor division —
# identical arithmetic in both engines). One hash aggregate; at 100 TB the
# per-bucket partials collapse map-side so the shuffle is #buckets rows.
# --------------------------------------------------------------------------
_HISTOGRAM_SQL = """
SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
       COUNT(*) AS n,
       CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
       CAST(MAX(o_totalprice) AS DOUBLE) AS hi
FROM orders GROUP BY 1 ORDER BY 1
"""


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "orders")
    return spark.sql(_HISTOGRAM_SQL)


# --------------------------------------------------------------------------
# Incremental view maintenance: merge partial aggregate STATES instead of
# recomputing. The base slice (history) and the delta slice (new arrivals)
# each reduce to (group, count, decimal-sum) partials; the merged view
# re-aggregates the two partial sets — count-sum and sum-sum are the state
# merge functions. At 100 TB this is THE pattern for daily rollups: the
# base partials are a tiny materialized table, each day only the delta
# scans, and decimal addition's associativity makes merged == full-recompute
# bit-for-bit (asserted by the oracle, which computes the full aggregate
# directly — the equality IS the test).
# --------------------------------------------------------------------------
_INCR_CUT = "1999-01-01"


def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(20,4)")).alias("tot"),
        )

    base = partial(orders.filter(F.col("o_orderdate") < _INCR_CUT))
    delta = partial(orders.filter(F.col("o_orderdate") >= _INCR_CUT))
    return (
        base.unionByName(delta)
        .groupBy("o_orderstatus")
        .agg(F.sum("cnt").alias("n_orders"), F.sum("tot").alias("t"))
        .select(
            "o_orderstatus",
            "n_orders",
            F.round(F.col("t"), 4).cast("double").alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


# the oracle recomputes the FULL aggregate in one pass: matching it proves
# the partial-state merge is lossless
_INCREMENTAL_AGG_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(20,4))), 4) AS DOUBLE)
           AS total_price
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


QUERIES = {
    "incremental_agg": q_incremental_agg,
    "scd2_customer_merge": q_scd2_customer_merge,
    "rule_quarantine": q_rule_quarantine,
    "price_histogram": q_price_histogram,
}

ORACLE = {
    "incremental_agg": _INCREMENTAL_AGG_SQL,
    "scd2_customer_merge": _SCD2_SQL,
    "rule_quarantine": _QUARANTINE_SQL,
    "price_histogram": _HISTOGRAM_SQL,
}
