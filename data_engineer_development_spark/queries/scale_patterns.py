"""Scale-pattern showcase queries.

These entries pin the explicit skew/scale mitigation operators to the
correctness gate: the optimization must not change results, so each runs a
deliberately-forced "hard path" (no broadcast, explicit salt) and its
oracle is the PLAIN equivalent — a hash-match proves the rewritten plan is
semantically identity.

- ``salted_skew_join`` — ``operators/joins.salted_join``: the fact side is
  salted with a per-row hash, the dim side replicated per salt, and the
  join forced to sort-merge (``hint('merge')``) so the salt actually
  changes the shuffle key (under a broadcast there is no shuffle to salt).
  At 100 TB this is the portable fix when one customer owns 1% of all
  orders and a single reducer would otherwise sort that key's multi-GB
  run; locally it is plan-asserted (tests/test_scale_patterns.py) and
  value-asserted here against the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineer_development_spark.operators.joins import salted_join
from data_engineer_development_spark.sources import load_table

_SALT_BUCKETS = 8


def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = salted_join(
        orders,
        cust,
        "o_custkey",
        "c_custkey",
        row_salt=F.xxhash64("o_orderkey"),
        salt_buckets=_SALT_BUCKETS,
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 4)
            .cast("double")
            .alias("segment_value"),
        )
        .orderBy("c_mktsegment")
    )


_SALTED_SKEW_JOIN_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4) AS DOUBLE)
       AS segment_value
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


QUERIES = {
    "salted_skew_join": q_salted_skew_join,
}

ORACLE = {
    "salted_skew_join": _SALTED_SKEW_JOIN_SQL,
}
