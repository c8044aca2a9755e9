"""Scale-pattern operators: salted aggregation ≡ plain aggregation,
bin-bucketed range join plan shape, bucketed co-located joins, stateful
streaming totals ≡ batch totals."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineer_development_spark.operators.joins import salted_agg
from data_engineer_development_spark.sources import load_table
from tests.conftest import SF_CORRECT, fresh_db


def test_salted_agg_equals_plain(spark):
    li = load_table(spark, SF_CORRECT, "lineitem")
    aggs = [
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(20,4)")).alias("sum_qty"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_shipdate").alias("min_ship"),
    ]
    plain = li.groupBy("l_returnflag").agg(*aggs)
    salted = salted_agg(li, ["l_returnflag"], aggs, salt_buckets=8)

    def rows(df):
        return sorted(
            (r["l_returnflag"], r["n_items"], r["sum_qty"], r["max_price"], r["min_ship"])
            for r in df.collect()
        )

    assert rows(plain) == rows(salted)


def test_salted_agg_rejects_unknown_merge(spark):
    import pytest

    li = load_table(spark, SF_CORRECT, "lineitem")
    with pytest.raises(ValueError, match="alias"):
        salted_agg(li, ["l_returnflag"], [F.avg("l_quantity").alias("avg_qty")])


def test_range_join_is_equijoin_plan(spark):
    from data_engineer_development_spark.queries import all_queries

    df = all_queries()["range_join_promos"](spark, SF_CORRECT)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_bucketed_join_avoids_shuffle(spark):
    # co-located join: both sides bucketed by the join key → zero Exchange
    fresh_db(spark, "t_buck")
    orders = load_table(spark, SF_CORRECT, "orders")
    customer = load_table(spark, SF_CORRECT, "customer")
    (orders.write.mode("overwrite").bucketBy(8, "o_custkey")
     .sortBy("o_custkey").saveAsTable("t_buck.orders_b"))
    (customer.write.mode("overwrite").bucketBy(8, "c_custkey")
     .sortBy("c_custkey").saveAsTable("t_buck.customer_b"))

    ob, cb = spark.table("t_buck.orders_b"), spark.table("t_buck.customer_b")
    joined = ob.join(
        cb.hint("merge"), ob.o_custkey == cb.c_custkey
    ).select("o_orderkey", "c_name")
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan
    assert joined.count() > 0


def test_stateful_running_totals_match_batch(spark):
    from data_engineer_development_spark.streaming import stream_events
    from data_engineer_development_spark.streaming.stateful import (
        running_user_totals,
    )
    from data_engineer_development_spark.streaming.windows import (
        run_to_memory_sink,
    )

    stream = running_user_totals(stream_events(spark, SF_CORRECT))
    assert stream.isStreaming
    run_to_memory_sink(stream, "s_state", output_mode="update")

    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.table("s_state").collect()
    }
    batch = {
        r["user_id"]: (r["n"], round(r["t"], 6))
        for r in load_table(spark, SF_CORRECT, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert got == batch
