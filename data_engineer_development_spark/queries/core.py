"""Reference-derived operator queries (SURVEY.md §2.3/2.5/2.7/2.9).

Each query re-expresses one reference construct over the driver's star-schema
testdata, with a DuckDB oracle. Reference citations inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineer_development_spark.functions import (
    davg,
    decode_map,
    dsum,
    sentinel_to_null,
    split_date_parts_to_date,
)
from data_engineer_development_spark.sources import load_table


# --------------------------------------------------------------------------
# Flagship: pricing summary (scan → filter → groupBy agg → sort).
# Engine-completeness query (the reference's only aggregate is DISTINCT,
# SURVEY.md §2.5); shaped like TPC-H Q1 over the driver's lineitem.
# --------------------------------------------------------------------------
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Tight decimal precisions so every intermediate product is exact on both
    # engines: (18,4)*(9,4) -> (28,8); (28,8)*(9,4) -> (38,12) — at wider
    # operand types the 38-digit cap forces engine-specific rounding and the
    # final doubles differ in the last bit.
    disc_factor = F.lit(1).cast("decimal(5,4)") - F.col("l_discount").cast("decimal(8,4)")
    tax_factor = F.lit(1).cast("decimal(5,4)") + F.col("l_tax").cast("decimal(8,4)")
    disc_price = F.col("l_extendedprice").cast("decimal(18,4)") * disc_factor
    charge = disc_price * tax_factor
    return (
        li.filter(F.col("l_shipdate") < F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            # ROUND(...,4) before the double cast: at scale 4 the unscaled
            # value fits in 2^53, so decimal→double is exact on both engines
            # (at scale 12 DuckDB's int128-divide cast can be 1 ulp off Java's
            # correctly-rounded BigDecimal conversion).
            F.round(F.sum(disc_price), 4).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 4).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_PRICING_SUMMARY_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
           * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(8,4)))), 4) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
           * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(8,4)))
           * (CAST(1 AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(8,4)))), 4) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(20,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# P1+P5+F1+F2+F3+F4+F5: the quality-zone typed SELECT, re-expressed.
# Mirrors /root/reference/airflow-dags/export_svg.py:210-244 — sentinel→NULL
# (CASE ... IN), CAST to INT64, and the SPLIT/CONCAT/DATE M/D/YYYY rebuild —
# over the orders table.
# --------------------------------------------------------------------------
def q_quality_typed_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # Treat '4-NOT SPECIFIED' as the sentinel (the reference's '-8') and
    # decode the leading digit of o_orderpriority as the typed value.
    pri = sentinel_to_null("o_orderpriority", ["4-NOT SPECIFIED"])
    mdy = F.date_format("o_orderdate", "MM/dd/yyyy")
    return o.select(
        F.col("o_orderkey"),
        F.split(pri, "-").getItem(0).cast("long").alias("priority_num"),
        sentinel_to_null("o_orderstatus", ["P"]).alias("status_clean"),
        split_date_parts_to_date(mdy).alias("order_date"),
    ).orderBy("o_orderkey")


_QUALITY_TYPED_SELECT_SQL = """
SELECT
  o_orderkey,
  CAST(string_split(CASE WHEN o_orderpriority IN ('4-NOT SPECIFIED') THEN NULL
                         ELSE o_orderpriority END, '-')[1] AS BIGINT) AS priority_num,
  CASE WHEN o_orderstatus IN ('P') THEN NULL ELSE o_orderstatus END AS status_clean,
  CAST(concat(
      string_split(strftime(o_orderdate, '%m/%d/%Y'), '/')[3], '-',
      string_split(strftime(o_orderdate, '%m/%d/%Y'), '/')[1], '-',
      string_split(strftime(o_orderdate, '%m/%d/%Y'), '/')[2]) AS DATE) AS order_date
FROM orders
ORDER BY o_orderkey
"""


# --------------------------------------------------------------------------
# A1+F1+P4+O1+K2 shape: dimension build — SELECT DISTINCT(key) + CASE decode
# + WHERE key IS NOT NULL + ORDER BY key, exactly the 15-dim pattern of
# export_svg.py:275-293 (DimCircuit et al.), over order status codes.
# --------------------------------------------------------------------------
def q_dim_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    decode = decode_map(
        "o_orderstatus", {"O": "OPEN", "F": "FULFILLED", "P": "PENDING"}
    )
    return (
        o.filter(F.col("o_orderstatus").isNotNull())
        .select(F.col("o_orderstatus").alias("status_code"), decode.alias("status_name"))
        .distinct()
        .orderBy("status_code")
    )


_DIM_DECODE_SQL = """
SELECT DISTINCT
  o_orderstatus AS status_code,
  CASE WHEN o_orderstatus = 'O' THEN 'OPEN'
       WHEN o_orderstatus = 'F' THEN 'FULFILLED'
       WHEN o_orderstatus = 'P' THEN 'PENDING' END AS status_name
FROM orders
WHERE o_orderstatus IS NOT NULL
ORDER BY status_code
"""


# --------------------------------------------------------------------------
# P3+O1: identity projection (SELECT *), the quality→trusted promotion
# (export_svg.py:257-261), with the dim-style ORDER BY on write.
# --------------------------------------------------------------------------
def q_identity_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "region").orderBy("r_regionkey")


_IDENTITY_PROJECTION_SQL = "SELECT * FROM region ORDER BY r_regionkey"


# --------------------------------------------------------------------------
# P2+P6: column pruning by projection + equality/range predicate
# (export_svg.py:210-244 drops 12 of 46 cols; P6 equality arms :278-289).
# --------------------------------------------------------------------------
def q_column_prune_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_acctbal") > 0.0)
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


_COLUMN_PRUNE_FILTER_SQL = """
SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 0.0 ORDER BY c_custkey
"""


# --------------------------------------------------------------------------
# P5: IN-list predicate (TRANSOFF IN ('-8','J','A',...) — export_svg.py:229-231)
# --------------------------------------------------------------------------
def q_in_list_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_returnflag").isin("A", "R"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag")
    )


_IN_LIST_FILTER_SQL = """
SELECT l_returnflag, COUNT(*) AS n FROM lineitem
WHERE l_returnflag IN ('A','R') GROUP BY l_returnflag ORDER BY l_returnflag
"""


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "quality_typed_select": q_quality_typed_select,
    "dim_decode": q_dim_decode,
    "identity_projection": q_identity_projection,
    "column_prune_filter": q_column_prune_filter,
    "in_list_filter": q_in_list_filter,
}

ORACLE = {
    "pricing_summary": _PRICING_SUMMARY_SQL,
    "quality_typed_select": _QUALITY_TYPED_SELECT_SQL,
    "dim_decode": _DIM_DECODE_SQL,
    "identity_projection": _IDENTITY_PROJECTION_SQL,
    "column_prune_filter": _COLUMN_PRUNE_FILTER_SQL,
    "in_list_filter": _IN_LIST_FILTER_SQL,
}
