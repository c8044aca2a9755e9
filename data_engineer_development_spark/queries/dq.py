"""Data-quality expectation suite — the dbt-test / Great-Expectations
operator class: a declarative battery of table contracts evaluated in
bulk, emitting one (check, violations, passed) row per expectation.

The reference pipeline enforces contracts implicitly (typed SELECTs,
IS NOT NULL filters, sentinel decoding — medallion.py cites them); this
makes the contract check a first-class REPORT instead of a silent drop,
which is what an operating warehouse needs (alert on violation counts,
not on job failure).

Scale shape: the three single-column expectations ride ONE shared
full-scan aggregate (conditional sums — adding a tenth check adds a
counter, not a scan); uniqueness is one groupBy on the candidate key;
referential integrity is one anti-join. Nothing quadratic, nothing
collected; the report itself is check-count-sized.

STAGED for r16 registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineer_development_spark.sources import load_table


def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # one pass, three expectations (conditional counters)
    base = li.agg(
        F.sum(F.col("l_shipdate").isNull().cast("long")).alias("v_null"),
        F.sum(
            ((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50))
            .cast("long")
        ).alias("v_range"),
        F.sum(
            (~F.col("l_returnflag").isin("A", "N", "R")).cast("long")
        ).alias("v_accept"),
    ).select(
        F.expr(
            "stack(3,"
            " 'not_null_l_shipdate', v_null,"
            " 'range_l_quantity_1_50', v_range,"
            " 'accepted_l_returnflag', v_accept"
            ") as (check_name, n_violations)"
        )
    )
    # uniqueness of the candidate key: every row beyond a group's first
    # is a violation (so a clean table scores 0, and the count is
    # insensitive to how the duplicates distribute across groups)
    dup = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(
            F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("n_violations")
        )
        .select(
            F.lit("unique_l_orderkey_l_linenumber").alias("check_name"),
            "n_violations",
        )
    )
    # referential integrity: lineitem rows whose order does not exist
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    ref = (
        li.select("l_orderkey")
        .join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(
            F.lit("fk_l_orderkey_in_orders").alias("check_name"),
            "n_violations",
        )
    )
    return (
        base.unionByName(dup)
        .unionByName(ref)
        .select(
            "check_name",
            "n_violations",
            (F.col("n_violations") == 0).cast("int").alias("passed"),
        )
        .orderBy("check_name")
    )


_DQ_SQL = """
WITH base AS (SELECT
    CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS v_null,
    CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
             THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
    CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
             THEN 1 ELSE 0 END) AS BIGINT) AS v_accept
  FROM lineitem),
dup AS (SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) AS v
        FROM (SELECT COUNT(*) AS c FROM lineitem
              GROUP BY l_orderkey, l_linenumber) g
        WHERE c > 1),
ref AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)),
rows_out AS (
    SELECT 'not_null_l_shipdate' AS check_name, v_null AS n_violations
      FROM base
    UNION ALL SELECT 'range_l_quantity_1_50', v_range FROM base
    UNION ALL SELECT 'accepted_l_returnflag', v_accept FROM base
    UNION ALL SELECT 'unique_l_orderkey_l_linenumber', v FROM dup
    UNION ALL SELECT 'fk_l_orderkey_in_orders', v FROM ref)
SELECT check_name, n_violations,
       CAST(n_violations = 0 AS INT) AS passed
FROM rows_out ORDER BY check_name
"""


# registered r16 (staged r15, tri-SF + ANSI-on parity on record)
QUERIES: dict = {"dq_expectations": q_dq_expectations}

ORACLE: dict = {"dq_expectations": _DQ_SQL}
