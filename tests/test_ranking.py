"""with_global_rank (operators/ranking.py): the distributed global
row_number must agree EXACTLY with the single-partition window it replaces,
while keeping every input-sized window partitioned."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineer_development_spark.operators.ranking import with_global_rank


def _reference_rank(df, *cols):
    return df.withColumn(
        "expected", F.row_number().over(Window.orderBy(*cols))
    )


def test_matches_global_window_asc_with_ties(spark):
    # duplicate keys force the tiebreaker to carry the total order
    rows = [(i % 7, i) for i in range(501)]
    df = spark.createDataFrame(rows, "k int, u int").repartition(8)
    got = with_global_rank(df, "k", "u", rank_col="r", total_col="n")
    joined = got.join(_reference_rank(df, "k", "u"), ["k", "u"])
    assert joined.filter(F.col("r") != F.col("expected")).count() == 0
    assert got.select("n").distinct().collect()[0][0] == 501


def test_matches_global_window_desc_mixed(spark):
    rows = [((i * 37) % 11, f"t{i:04d}") for i in range(300)]
    df = spark.createDataFrame(rows, "cnt int, token string").repartition(8)
    order = [F.desc("cnt"), F.asc("token")]
    got = with_global_rank(df, *order, rank_col="r")
    joined = got.join(_reference_rank(df, *order), ["cnt", "token"])
    assert joined.filter(F.col("r") != F.col("expected")).count() == 0


def test_ranks_are_a_permutation(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "v int")
    got = with_global_rank(df.repartition(16), "v", rank_col="r")
    assert got.agg(
        F.count_distinct("r").alias("d"), F.min("r").alias("lo"),
        F.max("r").alias("hi"),
    ).collect()[0] == (1000, 1, 1000)


def test_input_sized_window_stays_partitioned(spark):
    """The only unpartitioned window in the plan must be the bounded
    per-partition-counts cumsum; the data-path row_number is partitioned
    by pid. Detected the same way as the global plan sweep."""
    import re

    df = spark.range(10_000).select(F.col("id").alias("v"))
    plan = (
        with_global_rank(df, "v", rank_col="r")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    unpart = 0
    part = 0
    for m in re.finditer(r"windowspecdefinition\(([^,)]+)[,)]", plan):
        first = m.group(1)
        if (" ASC" in first or " DESC" in first
                or first.startswith("specifiedwindowframe")):
            unpart += 1
        else:
            part += 1
    assert part >= 1  # the pid-partitioned row_number
    assert unpart <= 2  # offsets cumsum + total (bounded P-row input only)
