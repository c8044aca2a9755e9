"""Batch model inference (operators/inference.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_CORRECT

from data_engineer_development_spark.operators.inference import (
    deterministic_weights,
    linear_score,
)
from data_engineer_development_spark.queries.corpus_ops import (
    q_quality_model_score,
)


def test_score_path_is_broadcast_no_shuffle(spark):
    """The 100 TB contract: model weights ship as a broadcast; the corpus
    is never shuffled to be scored. The only exchange below the final
    presentation sort must be the broadcast of the 1-row weight table."""
    plan = (
        q_quality_model_score(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_exact_integer_score_against_python(spark):
    """The BIGINT dot product must equal a Python reference on the same
    quantized grid — order-independence means there is exactly one right
    answer."""
    rows = [
        (1, [1.0, -2.0, 0.5, 4.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector → all-zero quantization
        (3, [-1.5, 1.5, -1.5, 1.5]),
    ]
    w = [3, -1, 2, 0]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    got = {
        r["vec_id"]: r["score"]
        for r in linear_score(df, spark, w, bias=7).collect()
    }

    import math

    def quant_exact(v):
        mx = max(abs(float(x)) for x in v)
        return [
            0 if mx == 0.0 else int(math.floor(float(x) * 127.0 / mx + 0.5))
            for x in v
        ]

    for vid, vec in rows:
        expect = sum(q * wt for q, wt in zip(quant_exact(vec), w)) + 7
        assert got[vid] == expect, (vid, got[vid], expect)


def test_dimension_mismatch_scores_null_not_wrong(spark):
    """A vector shorter than the model must surface as NULL (schema drift
    made visible), never a silently truncated dot product."""
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0]), (3, [])],
        "vec_id int, embedding array<float>",
    )
    out = linear_score(df, spark, [1, 1, 1]).select("vec_id", "score")
    by_id = {r["vec_id"]: r["score"] for r in out.collect()}
    assert by_id[1] is None
    assert by_id[2] is not None
    assert by_id[3] is None  # empty vector is the same drift case


def test_caller_w_column_survives(spark):
    """ADVICE r8: a caller column literally named 'w' must neither clash
    with the broadcast weights nor be dropped; only the reserved
    __infer_*/__model_w names are asserted against."""
    import pytest

    df = spark.createDataFrame(
        [(1, [1.0, 2.0], 42)], "vec_id int, embedding array<float>, w int"
    )
    out = linear_score(df, spark, [1, 1]).collect()[0]
    assert out["w"] == 42 and out["score"] is not None

    bad = df.withColumnRenamed("w", "__model_w")
    with pytest.raises(AssertionError, match="__model_w"):
        linear_score(bad, spark, [1, 1])


def test_registry_entry_keep_split_is_nontrivial(spark):
    """Both classes present at sf0.01 — a threshold that keeps (or drops)
    everything would make the filter decision untestable."""
    agg = (
        q_quality_model_score(spark, SF_CORRECT)
        .groupBy("keep")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(r["keep"] for r in agg) == [0, 1], agg


def test_stratified_sample_rates_and_determinism(spark):
    """The downsampling consumer: per-band keep rates must hold against
    the deterministic hash (high keeps 100%, mid/low strictly thin), and
    two runs must select the IDENTICAL row set (no RNG state)."""
    from data_engineer_development_spark.queries.corpus_ops import (
        q_quality_model_score as scorefn,
        q_quality_stratified_sample as fn,
        _BAND_HI,
    )

    a = fn(spark, SF_CORRECT).collect()
    b = fn(spark, SF_CORRECT).collect()
    assert a == b
    # every high-band scored row survives (rate 100)
    n_high_scored = (
        scorefn(spark, SF_CORRECT).filter(F.col("score") >= _BAND_HI).count()
    )
    n_high_kept = sum(1 for r in a if r["band"] == "high")
    assert n_high_kept == n_high_scored
    # mid and low are strictly thinned but non-empty
    bands = {r["band"] for r in a}
    assert bands == {"high", "mid", "low"}


def test_deterministic_weights_shape():
    w = deterministic_weights(64)
    assert len(w) == 64
    assert min(w) >= -10 and max(w) <= 10
    assert len(set(w)) > 1
