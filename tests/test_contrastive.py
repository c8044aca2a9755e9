"""Regression tests for the contrastive-curation and IVF entries.

Pins the zero-norm exclusion in ``hard_negative_mining`` and the IVF
family (the sim_neardup lesson: a zero vector's cosine is 0/0 = NaN, and
Spark and DuckDB order NaN differently under DESC, so a zero-norm row
reaching a row_number ordering is a latent cross-engine parity break even
when the shipped fixture is clean). The test corpus deliberately carries
all three failure shapes: a zero-norm centroid candidate (id inside the
``vec_id <= K`` codebook convention), a zero-norm IVF QUERY id, and a
zero-norm plain corpus row.
"""

from __future__ import annotations

import duckdb
import pytest

from data_engineer_development_spark.queries.contrastive import (
    _HARD_NEG_SQL,
    q_hard_negative_mining,
)
from data_engineer_development_spark.queries.extras import (
    _ANN_RECALL_SQL,
    _IVF_MULTI_SQL,
    _IVF_SQL,
    q_ann_recall_eval,
    q_sim_ivf_multiprobe,
    q_sim_ivf_topk,
)
from data_engineer_development_spark.queries.similarity import (
    _SEMDEDUP_RECALL_SQL,
    _SEMDEDUP_SQL,
    _SIM_NEARDUP_SQL,
    _SIM_TOPK_SQL,
    DIMS,
    q_semantic_dedup,
    q_semdedup_recall_eval,
    q_sim_cosine_topk,
    q_sim_lsh_buckets,
    q_sim_neardup,
)
from data_engineer_development_spark.queries.similarity import (
    _lsh_buckets_sql,
)
from tests.oracle_harness import _normalize_rows


def _vec(hot: int, value: float = 1.0, second: int | None = None) -> list[float]:
    v = [0.0] * DIMS
    v[hot] = value
    if second is not None:
        v[second] = 0.5
    return v


@pytest.fixture(scope="module")
def zero_norm_dir(spark, tmp_path_factory):
    """A tiny embeddings table with a zero-norm CENTROID candidate (id 3),
    a zero-norm corpus row (id 99), a SHORTER-than-DIMS vector (id 14, the
    oracle NULLs it out) and a LONGER one (id 15, the oracle would
    silently TRUNCATE it where Spark's zip_with NULLs it) among otherwise
    well-formed 64-d vectors spanning two labels."""
    rows = [
        (0, "a", _vec(0)),
        (1, "b", _vec(0, second=1)),
        (2, "a", _vec(1)),
        (3, "a", [0.0] * DIMS),  # zero-norm centroid candidate → excluded
        (4, "b", _vec(1, second=2)),
        (5, "a", _vec(2)),
        (6, "b", _vec(2, second=3)),
        (7, "a", _vec(3)),
        (10, "b", _vec(0, value=2.0)),
        (11, "a", _vec(1, value=-1.0)),  # IVF query id, well-formed
        (12, "b", [0.0] * DIMS),  # zero-norm IVF QUERY id → excluded
        (13, "a", _vec(0, second=2)),  # IVF query id, well-formed
        (14, "b", [1.0] * (DIMS // 2)),  # short vector → excluded
        (15, "a", [1.0] * (DIMS + 32)),  # long vector → excluded
        (99, "b", [0.0] * DIMS),  # zero-norm corpus row → excluded
    ]
    d = tmp_path_factory.mktemp("zn")
    spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_zero_norm_rows_never_appear(spark, zero_norm_dir):
    out = q_hard_negative_mining(spark, zero_norm_dir).collect()
    assert out, "well-formed cross-label pairs must survive"
    touched = {r["anchor_id"] for r in out} | {r["negative_id"] for r in out}
    assert touched.isdisjoint({3, 12, 14, 15, 99})
    for r in out:
        assert r["cosine"] == r["cosine"], f"NaN cosine leaked: {r}"


def test_ivf_zero_norm_rows_never_appear(spark, zero_norm_dir):
    for fn in (q_sim_ivf_topk, q_sim_ivf_multiprobe):
        out = fn(spark, zero_norm_dir).collect()
        assert out, "well-formed neighbors must survive"
        assert {r["query_id"] for r in out} <= {11, 13}  # 12 is zero-norm
        assert {r["neighbor_id"] for r in out}.isdisjoint({3, 12, 14, 15, 99})
        for r in out:
            assert r["cosine"] == r["cosine"], f"NaN cosine leaked: {r}"
    recall = q_ann_recall_eval(spark, zero_norm_dir).collect()
    assert {r["query_id"] for r in recall} == {11, 13}


@pytest.mark.parametrize(
    "fn,sql",
    [
        (q_hard_negative_mining, _HARD_NEG_SQL),
        (q_sim_ivf_topk, _IVF_SQL),
        (q_sim_ivf_multiprobe, _IVF_MULTI_SQL),
        (q_ann_recall_eval, _ANN_RECALL_SQL),
        # query id 3 is the zero vector here → the exact-topk query-side
        # exclusion branch
        (q_sim_cosine_topk, _SIM_TOPK_SQL),
        (q_sim_neardup, _SIM_NEARDUP_SQL),
        (q_sim_lsh_buckets, _lsh_buckets_sql()),
        # the dims-pinned family: codebook membership (K lowest USABLE
        # ids) must skip the zero/short/long rows identically
        (q_semantic_dedup, _SEMDEDUP_SQL),
        (q_semdedup_recall_eval, _SEMDEDUP_RECALL_SQL),
    ],
    ids=[
        "hard_negative_mining",
        "sim_ivf_topk",
        "sim_ivf_multiprobe",
        "ann_recall_eval",
        "sim_cosine_topk",
        "sim_neardup",
        "sim_lsh_buckets",
        "semantic_dedup",
        "semdedup_recall_eval",
    ],
)
def test_zero_norm_parity_with_oracle(spark, zero_norm_dir, fn, sql):
    """Spark and DuckDB must agree row-for-row on the degenerate corpus —
    the exact comparison the driver's value-hash gate performs."""
    sdf = fn(spark, zero_norm_dir)
    srows = _normalize_rows(sdf.columns, [tuple(r) for r in sdf.collect()])

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{zero_norm_dir}/embeddings.parquet/*.parquet')"
    )
    res = con.execute(sql).arrow()
    ocols = res.column_names
    orows = _normalize_rows(
        ocols, [tuple(r) for r in zip(*[c.to_pylist() for c in res.columns])]
    )
    assert sorted(sdf.columns) == sorted(ocols)
    assert srows == orows


# ---------------------------------------------------------------------------
# r17 optimization pin: the per-cell numpy top-k kernel must reproduce the
# retired pair-join formulation (cell equi-join + seq_dot pandas_udf +
# row_number window) BIT-FOR-BIT — same cosines (identical sequential fold),
# same tie-breaks (bit-equal cosines fall to ascending negative_id), same
# NULL-label semantics (NULL != x is NULL → no pair, either side).
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def kernel_equiv_dir(spark, tmp_path_factory):
    """Ties + NULLs corpus: ids 20/21/22 share ONE identical vector under
    the opposite label (bit-equal cosines to every anchor → the rank is
    decided purely by the id tie-break), id 30 carries a NULL label, and
    there are > _HN_TOPK cross-label candidates per cell so the k cutoff
    is exercised."""
    base = _vec(0, second=1)
    rows = [
        (0, "a", _vec(0)),
        (1, "a", _vec(0, second=2)),
        (2, "b", _vec(1)),
        (5, "a", _vec(1, second=3)),
        (20, "b", base),
        (21, "b", base),   # identical vector, same label → exact tie
        (22, "b", base),   # identical vector → exact tie
        (23, "b", _vec(0, value=0.5)),
        (24, "b", _vec(2)),
        (30, None, _vec(3)),  # NULL label: never an anchor, never a negative
    ]
    d = tmp_path_factory.mktemp("keq")
    spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "embeddings.parquet")
    )
    return str(d)


def test_topk_kernel_matches_pair_join_formulation(spark, kernel_equiv_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_engineer_development_spark.operators.similarity import (
        norm_expr,
        seq_dot,
    )
    from data_engineer_development_spark.queries.contrastive import (
        _HN_K,
        _HN_TOPK,
    )
    from data_engineer_development_spark.sources import load_table

    new = q_hard_negative_mining(spark, kernel_equiv_dir).collect()

    # the RETIRED formulation, reproduced verbatim as the equivalence
    # reference: same assignment stage, then the pair join + seq_dot +
    # row_number window the kernel replaced
    vecs = load_table(spark, kernel_equiv_dir, "embeddings")
    usable = vecs.filter(F.size("embedding") == DIMS)
    cents = (
        usable.filter(F.col("vec_id") <= _HN_K)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("cv"),
            norm_expr("embedding").alias("cn"),
        )
        .filter(F.col("cn") > 0)
    )
    scored = (
        usable.select(
            "vec_id", "label", "embedding",
            norm_expr("embedding").alias("vn"),
        )
        .filter(F.col("vn") > 0)
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "cos_c", seq_dot("embedding", "cv") / (F.col("vn") * F.col("cn"))
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_c"), F.asc("cent_id")
    )
    assigned = (
        scored.withColumn("ark", F.row_number().over(w))
        .filter(F.col("ark") == 1)
        .select(
            "vec_id", "label", "embedding", "vn",
            F.col("cent_id").alias("cell"),
        )
    )
    a = assigned.select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").alias("av"),
        F.col("vn").alias("an"),
        "cell",
    )
    b = assigned.select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        F.col("embedding").alias("nv"),
        F.col("vn").alias("nn"),
        "cell",
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("anchor_label") != F.col("negative_label"))
        .withColumn(
            "cosine", seq_dot("av", "nv") / (F.col("an") * F.col("nn"))
        )
    )
    w2 = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), F.asc("negative_id")
    )
    old = (
        pairs.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= _HN_TOPK)
        .select(
            "anchor_id", "anchor_label", "rk",
            "negative_id", "negative_label", "cosine",
        )
        .collect()
    )

    assert sorted([tuple(r) for r in new], key=lambda t: (t[0], t[2])) == \
        sorted([tuple(r) for r in old], key=lambda t: (t[0], t[2]))
    # the tie trio (bit-equal cosines) must rank by ascending negative_id
    trio = [r for r in new if r["negative_id"] in (20, 21, 22)]
    by_anchor: dict = {}
    for r in trio:
        by_anchor.setdefault(r["anchor_id"], []).append(
            (r["rk"], r["negative_id"])
        )
    for ranked in by_anchor.values():
        ranked.sort()
        ids = [nid for _, nid in ranked]
        assert ids == sorted(ids), ranked
    # NULL-labeled id 30 appears on neither side
    touched = {r["anchor_id"] for r in new} | {r["negative_id"] for r in new}
    assert 30 not in touched


def test_topk_kernel_anchor_blocking_is_exact(
    spark, kernel_equiv_dir, monkeypatch
):
    """r18 hardening pin (ADVICE r17): the anchor-axis blocking inside the
    cell kernel must be invisible in the output — a chunk size smaller
    than every cell forces multi-block execution, and the result must be
    row-identical (ids, ranks, bit-equal cosines) to the one-block run."""
    from data_engineer_development_spark.queries import contrastive as C

    baseline = sorted(
        tuple(r) for r in q_hard_negative_mining(spark, kernel_equiv_dir).collect()
    )
    monkeypatch.setattr(C, "_HN_ANCHOR_CHUNK", 2)
    blocked = sorted(
        tuple(r) for r in C.q_hard_negative_mining(
            spark, kernel_equiv_dir
        ).collect()
    )
    assert blocked == baseline
