"""Similarity search over embedding columns (north-star extension,
SURVEY.md §7.2 item 5): brute-force cosine top-k as the exactness baseline,
sign-LSH bucketing as the scale path.

Dot products are sequential left-folds over the array (``aggregate`` /
DuckDB ``list_reduce``): float32 products are exact in double, and both
engines accumulate in the same order, so cosine values are bit-identical —
the oracle checks the scores, not just the neighbor ids.

Scale stance:
- brute-force is O(Q·N·d) with the query side broadcast — right answer for
  small Q or as the re-rank stage;
- sign-LSH (`bucket_assign`) hashes vectors into 2^planes buckets with fixed
  pseudo-random hyperplanes; candidates share a bucket (equi-join), turning
  100 TB all-pairs into per-bucket work. An IVF variant would swap the
  random planes for k-means centroids — same join shape.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from data_engineer_development_spark.cache import track_persist
from data_engineer_development_spark.functions.portable_hash import hyperplane


def _seq_norms(mat: "np.ndarray") -> "np.ndarray":
    """Row norms with the same sequential fold order as ``norm_expr``."""
    acc = mat[:, 0] * mat[:, 0]
    for d in range(1, mat.shape[1]):
        acc += mat[:, d] * mat[:, d]
    return np.sqrt(acc)


def _seq_dot_impl(a: pd.Series, b: pd.Series) -> pd.Series:
    if len(a) == 0:
        return pd.Series([], dtype="float64")
    A = np.vstack(a.to_numpy()).astype(np.float64)
    B = np.vstack(b.to_numpy()).astype(np.float64)
    acc = A[:, 0] * B[:, 0]
    for d in range(1, A.shape[1]):
        acc += A[:, d] * B[:, d]
    return pd.Series(acc)


_SEQ_DOT = None


def seq_dot(a, b) -> F.Column:
    """Arrow-vectorized dot product with STRICTLY SEQUENTIAL accumulation.

    ``acc = a0*b0; acc += a1*b1; ...`` — the same left-fold order as the JVM
    ``aggregate`` expression and the DuckDB ``list_reduce`` oracle, so every
    IEEE rounding step is identical across all three, while numpy executes
    each step vectorized across the whole Arrow batch (~100× faster than
    interpreting the fold per row). This is the hot-path scoring kernel for
    all-pairs similarity (12.5M pairs at sf0.1; block-distributed at 100 TB).

    (UDF registration is lazy: ``pandas_udf`` needs a live SparkSession.)
    """
    global _SEQ_DOT
    if _SEQ_DOT is None:
        _SEQ_DOT = pandas_udf(_seq_dot_impl, "double")
    return _SEQ_DOT(a, b)


def dot_expr(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def norm_expr(a: str) -> F.Column:
    return F.sqrt(
        F.expr(
            f"aggregate({a}, cast(0.0 as double), "
            f"(acc, x) -> acc + cast(x as double) * cast(x as double))"
        )
    )


def cosine(a: str, b: str) -> F.Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


#: pairs per scoring task — enough that Arrow batching and numpy vectorization
#: amortize, small enough that tasks stay balanced. Empirically (local[32],
#: 2M pairs) oversubscribing tasks past this costs 6× (JVM Arrow pumps and
#: python workers fight for the same cores).
PAIRS_PER_TASK = 250_000


def _pair_partitions(n_pairs: int, spark) -> int:
    par = spark.sparkContext.defaultParallelism
    return max(1, min((n_pairs + PAIRS_PER_TASK - 1) // PAIRS_PER_TASK, 4 * par))


def cosine_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (self excluded).
    The query side is broadcast; ranking is deterministic (score desc, id).

    ``dims``, when set, pins participating vectors to exactly that width
    (oracle-portable callers MUST pin: SQL duals that index 1..dims
    NULL-out shorter vectors but truncate longer ones)."""
    if dims is not None:
        vectors = vectors.filter(F.size(vec_col) == dims)
    # The probe side sets the output partitioning of the broadcast join —
    # size it by pair count so the scoring stage neither runs on one task
    # (single-file scan) nor fragments into per-task overhead.
    n_vec = vectors.count()
    parts = _pair_partitions(len(query_ids) * n_vec, vectors.sparkSession)
    # zero-norm exclusion on queries AND candidates (the sim_neardup
    # lesson: 0/0 cosines are NaN, and Spark/DuckDB order NaN differently
    # under DESC — no NaN may reach the row_number ranking)
    q = (
        vectors.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            norm_expr(vec_col).alias("qn"),
        )
        .filter(F.col("qn") > 0)
    )
    n = (
        vectors.repartition(parts)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("nv"),
            norm_expr(vec_col).alias("nn"),
        )
        .filter(F.col("nn") > 0)
    )
    scored = (
        F.broadcast(q)
        .crossJoin(n)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", seq_dot("qv", "nv") / (F.col("qn") * F.col("nn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "rk", "neighbor_id", "cosine")
    )


def bucket_assign(
    vectors: DataFrame,
    planes: int = 8,
    dims: int = 64,
    vec_col: str = "embedding",
    plane_offset: int = 0,
    out_col: str = "bucket",
) -> DataFrame:
    """Sign-LSH bucket id: bit p = (v · hyperplane_{plane_offset+p} >= 0).
    Hyperplanes are fixed md5-derived 3-decimal literals (portable to the
    oracle). ``plane_offset`` selects a disjoint slice of the same plane
    family — table t of a multi-table (banded) LSH uses offset t·planes,
    so table 0 is bit-identical to the single-table assignment."""
    bit_cols = []
    for pidx in range(planes):
        w = hyperplane(plane_offset + pidx, dims)
        lits = ", ".join(repr(x) for x in w)
        # Fold over a literal weight array: ((0.0+t1)+t2)+... is bit-identical
        # to the oracle's left-assoc sum (0.0+t1 == t1 exactly), and the
        # expression tree stays small — a flat 512-term sum-of-cases blows
        # Catalyst analysis/codegen time (~40 s of pure plan compilation).
        dot = (
            f"aggregate(zip_with({vec_col}, array({lits}), "
            f"(x, w) -> cast(x as double) * w), cast(0.0 as double), "
            f"(acc, v) -> acc + v)"
        )
        bit_cols.append(f"(case when ({dot}) >= 0 then {1 << pidx} else 0 end)")
    return vectors.withColumn(out_col, F.expr(" + ".join(bit_cols)))


#: exact-path ceiling: the index side is broadcast as one numpy matrix
#: (~0.5 GB per million 64-dim float64 vectors); past this the driver
#: collect would be the scale-killer, so the operator auto-switches to the
#: LSH-bucketed path instead of attempting it.
MAX_BROADCAST_ROWS = 1_000_000


def neardup_pairs_cosine(
    vectors: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh: bool = False,
    planes: int = 4,
    dims: int = 64,
    max_broadcast_rows: int = MAX_BROADCAST_ROWS,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ tau, id1 < id2.

    Exact path = distributed **block-nested-loop**: the whole index side
    (id, vector, norm) is broadcast as one numpy matrix; each task scores its
    block of rows against the matrix INSIDE numpy via ``mapInPandas`` and
    emits only the surviving (id1, id2, cosine) rows. The O(N²) pair set is
    never materialized as Spark rows and never crosses the Arrow boundary —
    at sf0.1 that's the difference between shipping ~1 GB of per-pair arrays
    JVM→Python and shipping 2 000 input rows + a few hundred output rows.
    (This mirrors Spark's own BroadcastNestedLoopJoin memory shape: the
    broadcast side must fit per executor — 64-dim float64 ≈ 0.5 GB per
    million vectors. Past that, ``use_lsh=True`` is the path.)

    All arithmetic is the same sequential left-fold as the JVM ``aggregate``
    expression and the DuckDB oracle (see ``seq_dot``), so cosine values are
    bit-identical across all three.

    ``use_lsh=True`` restricts candidate pairs to same-bucket (the scale
    path; recall < 1 by design) via a bucket equi-join. The exact path
    guards its own ceiling: above ``max_broadcast_rows`` vectors it
    auto-switches to the LSH path rather than collect a matrix the driver
    can't hold.

    Zero-norm vectors are EXCLUDED up front on both paths: their cosine is
    0/0, and the three backends disagree on what NaN does to a ``>= tau``
    filter (numpy: false; Spark SQL and DuckDB: NaN compares greater than
    everything) — filtering is the only semantics all three express
    identically. Mixed vector widths fail loudly in the numpy kernel
    (``np.vstack`` raises) rather than silently NULL-ing like the JVM
    ``zip_with`` would; callers with mixed-width corpora filter to one
    width first (see ``semdedup``'s dims pinning).
    """
    n_vec: int | None = None
    if not use_lsh:
        # one count() job, paid only when the caller asked for the exact
        # path (explicit use_lsh=True skips it entirely)
        n_vec = vectors.count()
        if n_vec > max_broadcast_rows:
            warnings.warn(
                f"neardup_pairs_cosine: {n_vec} vectors exceed the exact-path "
                f"broadcast ceiling ({max_broadcast_rows}); switching to the "
                "LSH-bucketed path (recall < 1). Pass use_lsh=True to opt in "
                "explicitly, or raise max_broadcast_rows.",
                stacklevel=2,
            )
            use_lsh = True
    if use_lsh:
        # no count() here: the bucket equi-join repartitions on its key
        # anyway (and AQE re-coalesces), so input parallelism just needs a
        # sane floor — defaultParallelism, not a pair-count-sized job
        parts = vectors.sparkSession.sparkContext.defaultParallelism
        with_norm = (
            vectors.repartition(parts)
            .select(F.col(id_col), F.col(vec_col), norm_expr(vec_col).alias("nrm"))
            .filter(F.col("nrm") > 0)
        )
        v = bucket_assign(with_norm, planes=planes, dims=dims, vec_col=vec_col)
        a = v.select(
            F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"),
            F.col("nrm").alias("nrm1"), "bucket",
        )
        b = v.select(
            F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"),
            F.col("nrm").alias("nrm2"), "bucket",
        )
        pairs = a.join(b, "bucket").filter(F.col("id1") < F.col("id2"))
        return (
            pairs.withColumn(
                "cosine", seq_dot("v1", "v2") / (F.col("nrm1") * F.col("nrm2"))
            )
            .filter(F.col("cosine") >= tau)
            .select("id1", "id2", "cosine")
        )

    spark = vectors.sparkSession
    nz = vectors.filter(norm_expr(vec_col) > 0)
    rows = nz.select(id_col, vec_col).collect()
    if not rows:
        # np.vstack([]) raises; an empty (or all-zero-norm) corpus has no
        # pairs — return the empty result with the contract schema
        return spark.createDataFrame([], "id1 long, id2 long, cosine double")
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.vstack([r[1] for r in rows]).astype(np.float64)
    bc = spark.sparkContext.broadcast((ids, mat))

    parts = _pair_partitions(len(ids) * (len(ids) - 1) // 2, spark)

    def score_blocks(batches):
        b_ids, b_mat = bc.value
        b_norm = _seq_norms(b_mat)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a_ids = pdf[id_col].to_numpy().astype(np.int64)
            a_mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            a_norm = _seq_norms(a_mat)
            # sequential left-fold over dims, vectorized over the block
            acc = a_mat[:, 0:1] * b_mat[None, :, 0]
            for d in range(1, a_mat.shape[1]):
                acc += a_mat[:, d : d + 1] * b_mat[None, :, d]
            cos = acc / (a_norm[:, None] * b_norm[None, :])
            keep = (a_ids[:, None] < b_ids[None, :]) & (cos >= tau)
            i, j = np.nonzero(keep)
            yield pd.DataFrame(
                {"id1": a_ids[i], "id2": b_ids[j], "cosine": cos[i, j]}
            )

    return nz.repartition(parts).mapInPandas(
        score_blocks, "id1 long, id2 long, cosine double"
    )


# --------------------------------------------------------------------------
# SemDeDup: embedding-space near-duplicate removal (Abbas et al. 2023,
# arXiv:2303.09540) — cluster vectors, then drop within-cluster near-dups.
# --------------------------------------------------------------------------
#: Spark's non-ANSI double→bigint cast bounds (the numpy quantizer mimics
#: them exactly for the non-finite corner: NaN → 0, ±inf → clamp).
_LONG_MAX = (1 << 63) - 1
_LONG_MIN = -(1 << 63)


def _quantize_rows(embs, np=np):
    """(qv_list, qn_list) for a sequence of embedding arrays — the int8
    max-abs grid, numerically IDENTICAL to the JVM HOF formulation: each
    element is ``floor(cast(x as double) * 127.0 / mx + 0.5)`` with the
    same IEEE operation order, ``mx`` is an exact max (order-free), and
    ``qn`` an exact int64 sum of squares. Rows are grouped by width so
    the arithmetic is one vectorized pass per distinct width."""
    n = len(embs)
    qv_out: list = [None] * n
    qn_out: list = [None] * n
    by_len: dict[int, list[int]] = {}
    arrs: list = [None] * n
    for i, e in enumerate(embs):
        if e is None:
            continue  # NULL array → NULL qv / NULL qn (JVM transform(NULL))
        a = np.asarray(e, dtype=np.float64)  # float32→double: exact
        arrs[i] = a
        by_len.setdefault(a.shape[0], []).append(i)
    for w, idxs in by_len.items():
        if w == 0:
            # empty array: fold inits — mx 0.0, qv [], qn 0
            for i in idxs:
                qv_out[i] = []
                qn_out[i] = 0
            continue
        M = np.vstack([arrs[i] for i in idxs])
        finite = np.isfinite(M).all(axis=1)
        mx = np.max(np.abs(M), axis=1)
        with np.errstate(all="ignore"):
            Q = np.floor(M * 127.0 / mx[:, None] + 0.5)
        Q = np.where(mx[:, None] == 0.0, 0.0, Q)
        for r, i in enumerate(idxs):
            if finite[r]:
                qi = Q[r].astype(np.int64)
                qv_out[i] = qi.tolist()
                qn_out[i] = int(np.dot(qi, qi))
            else:
                # non-finite input: mimic Spark's non-ANSI double→bigint
                # cast per element (NaN → 0, ±inf saturates)
                qi2 = []
                for x in Q[r]:
                    if x != x:
                        qi2.append(0)
                    elif x >= float(_LONG_MAX):
                        qi2.append(_LONG_MAX)
                    elif x <= float(_LONG_MIN):
                        qi2.append(_LONG_MIN)
                    else:
                        qi2.append(int(x))
                qv_out[i] = qi2
                qn_out[i] = sum(q * q for q in qi2)
    return qv_out, qn_out


def _with_quantized(
    vectors: DataFrame, id_col: str, vec_col: str, *extra_cols: str,
    via: str = "numpy",
) -> DataFrame:
    """(id, vec[, extra...], qv, qn): int8 max-abs quantization
    (`operators/inference.py` grid) + integer self-dot — the shared front
    of the semantic-dedup family. ``extra_cols`` ride along untouched
    (e.g. a shard key).

    Two physical paths, bit-identical by construction (pinned by
    tests/test_semdedup.py::test_numpy_quantizer_equals_jvm):

    - ``via='numpy'`` (default, OPTIMIZATION r18 — guide §4.2/§4.4): one
      Arrow-batched ``mapInPandas`` pass. The JVM formulation's
      higher-order functions are INTERPRETED per row (~0.15 ms/row), and
      worse, Catalyst pushes every downstream ``qn > 0`` filter below the
      projection by INLINING the whole quantization chain into the scan
      filter — re-evaluating the max-abs fold 3× and the qv/qn folds once
      more per row (measured: the 8-row semdedup seed collect cost 2.0 s
      at sf0.1, ~5× the projection itself). The opaque Python node
      computes each quantity exactly once and is a pushdown barrier, so
      no consumer can accidentally multiply it. Math is element-wise IEEE
      on doubles plus exact integer sums — identical numbers.
    - ``via='jvm'``: the pure-SQL HOF projection. REQUIRED where an
      opaque node is unusable — the streaming gate keeps it because an
      event-time watermark tag does not survive a Python node.

    Caveat (numpy path, documented divergence on degenerate data only):
    a NULL *element* inside an embedding arrives through Arrow as NaN,
    so such rows quantize like NaN-bearing rows (elements → 0) instead
    of the JVM's NULL-poisoned qn; NULL/empty ARRAYS and all-finite rows
    — everything the fixtures and oracles exercise — agree exactly."""
    df = vectors.select(id_col, vec_col, *extra_cols)
    if via == "jvm":
        return (
            df
            .withColumn("__sd_mx", F.expr(
                f"aggregate(transform({vec_col}, x -> abs(cast(x as double))),"
                " cast(0.0 as double), (a, x) -> greatest(a, x))"))
            .withColumn("qv", F.expr(
                f"transform({vec_col}, x -> cast(if(__sd_mx = 0.0d, 0.0d,"
                f" floor(cast(x as double) * 127.0d / __sd_mx + 0.5d)) as bigint))"))
            .withColumn("qn", F.expr(
                "aggregate(transform(qv, x -> x * x),"
                " cast(0 as bigint), (a, x) -> a + x)"))
            .drop("__sd_mx")
        )

    in_cols = df.columns
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", qv array<bigint>, qn bigint"

    def quantize(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf[in_cols].copy()
            qv, qn = _quantize_rows(pdf[vec_col].to_numpy())
            pdf["qv"] = qv
            pdf["qn"] = pd.array(qn, dtype="Int64")
            yield pdf

    return df.mapInPandas(quantize, out_schema)


def quantized_neardup_pairs(
    vectors: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_broadcast_rows: int = MAX_BROADCAST_ROWS,
    dims: int | None = None,
) -> DataFrame:
    """EXACT near-dup pairs (id1 < id2) on the int8-quantized grid — the
    all-pairs truth set that grades ``semdedup``'s cell restriction
    (``q_semdedup_recall_eval``), same role as the exact-Jaccard truth in
    ``lsh_candidate_recall``.

    Same block-nested-loop shape as ``neardup_pairs_cosine``: the whole
    quantized matrix (ids, qv, qn) broadcasts; each task scores its row
    block against it in ONE float64 matmul and emits only the surviving
    id pairs — the O(N²) pair set never materializes as rows. The float64
    path is EXACT here, not approximate: every product is an integer
    ≤ 127² and every partial sum an integer < 2⁵³, so BLAS accumulation
    order cannot round — the numbers equal int64 math (and therefore the
    DuckDB oracle) bit-for-bit, at BLAS speed. The denominator is
    ``sqrt(qn_a * qn_b)`` — ONE sqrt over the exact integer product
    (≤ (dims·127²)² < 2⁵³), matching the oracle's
    ``sqrt(CAST(a.qn * b.qn AS DOUBLE))`` bit-for-bit; the algebraically
    equal ``sqrt(qn_a) * sqrt(qn_b)`` differs by 1 ulp for ~a third of
    integer pairs and can flip membership for a cosine within an ulp
    of tau.

    O(N²·d) BY DEFINITION (it is the exactness baseline); the broadcast
    ceiling guards the driver the same way the brute cosine path does.
    Zero-norm and off-dims vectors are excluded, as everywhere in the
    family. Callers with an oracle-pinned dimensionality (queries/
    similarity.DIMS) pass ``dims`` explicitly so both engines agree on
    which vectors participate even if the corpus ever mixes widths;
    ``dims=None`` takes the MAX width present in the data (deterministic,
    but data-dependent).
    """
    spark = vectors.sparkSession
    q = _with_quantized(vectors, id_col, vec_col).filter(F.col("qn") > 0)
    rows = q.select(id_col, "qv", "qn").collect()  # bounded: exactness baseline
    if len(rows) > max_broadcast_rows:
        # caller-facing contract, not an internal invariant: under
        # `python -O` an assert strips and the oversized corpus would
        # proceed into the O(N²) broadcast (ADVICE r12 #1 class)
        raise ValueError(
            f"quantized_neardup_pairs is the O(N²) truth baseline; "
            f"{len(rows)} vectors exceed the {max_broadcast_rows} ceiling"
        )
    if dims is None:
        dims = max((len(r["qv"]) for r in rows), default=0)
    rows = [r for r in rows if len(r["qv"]) == dims]
    if not rows:
        return spark.createDataFrame([], "id1 long, id2 long")
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r["qv"] for r in rows], dtype=np.float64)
    qns = np.array([r["qn"] for r in rows], dtype=np.int64)
    bc = spark.sparkContext.broadcast((ids, mat, qns))
    parts = _pair_partitions(len(ids) * (len(ids) - 1) // 2, spark)

    def score_blocks(batches):
        b_ids, b_mat, b_qn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a_ids = pdf[id_col].to_numpy().astype(np.int64)
            a_mat = np.vstack(pdf["qv"].to_numpy()).astype(np.float64)
            a_qn = pdf["qn"].to_numpy().astype(np.int64)
            # sqrt of the exact INTEGER product (< 2⁵³), not a product of
            # sqrts — the oracle's sqrt(CAST(a.qn*b.qn AS DOUBLE)) exactly
            den = np.sqrt((a_qn[:, None] * b_qn[None, :]).astype(np.float64))
            cos = (a_mat @ b_mat.T) / den
            keep = (a_ids[:, None] < b_ids[None, :]) & (cos >= tau)
            i, j = np.nonzero(keep)
            yield pd.DataFrame({"id1": a_ids[i], "id2": b_ids[j]})

    return (
        q.filter(F.size(vec_col) == dims)
        .select(id_col, "qv", "qn")
        .repartition(parts)
        .mapInPandas(score_blocks, "id1 long, id2 long")
    )



def _codebook_argmax_expr(cents: list[tuple[int, list[int], int]]) -> F.Column:
    """argmax over a LITERAL codebook: (cosine DESC, cent_id ASC) via
    array_max on (s, -cent_id) structs — one projection, no shuffle.
    Expects (id, qv, qn) columns in scope (``_with_quantized`` output)."""
    lit_cents = ", ".join(
        f"struct(cast({cid} as bigint) as cent_id,"
        f" array({', '.join(str(int(x)) + 'L' for x in cqv)}) as cqv,"
        f" cast({int(cqn)} as bigint) as cqn)"
        for cid, cqv, cqn in cents
    )
    return F.expr(
        f"array_max(transform(array({lit_cents}), c -> struct("
        "cast(aggregate(zip_with(qv, c.cqv, (x, y) -> x * y),"
        " cast(0 as bigint), (a, x) -> a + x) as double)"
        " / sqrt(cast(qn * c.cqn as double)) as s,"
        " -c.cent_id as nc)))"
    )


#: Codebook size above which cell assignment switches from the literal
#: array-of-structs projection to the broadcast-numpy scorer. The literal
#: expression embeds K·dims integer literals into the plan — fine for tens
#: of centroids, quadratic trouble for Catalyst (analysis + codegen) past
#: a few hundred. The numpy path closes auto-K's former scale hole: the
#: codebook rides to executors as a closure capture (K·dims int64 ≈ 0.5 MB
#: per 1k centroids at 64 dims) and each Arrow batch scores via one exact
#: int64 matmul.
LITERAL_CODEBOOK_MAX = 64


def _assign_cells(
    df: DataFrame, cents: list[tuple[int, list[int], int]], dims: int,
    via: str = "auto",
) -> DataFrame:
    """Add the ``cell`` column: argmax_c cosine(qv, c) with (s DESC,
    cent_id ASC) tie-break, over a ``_with_quantized`` frame.

    Two physical paths, BIT-IDENTICAL by construction (pinned by
    tests/test_semdedup.py::test_numpy_assignment_equals_literal): the
    dot is exact int64 in both (JVM ``zip_with``/``aggregate`` vs numpy
    matmul — integer math, no accumulation-order concern), the cast to
    double is exact, sqrt/divide are IEEE on identical inputs, so equal
    scores are EXACTLY equal and the tie-break is the same lowest
    cent_id (cents sorted ascending; ``np.argmax`` returns the first
    maximum). ``via='literal'`` is a pure projection (zero shuffle,
    whole-stage codegen); ``via='numpy'`` is a ``mapInPandas`` projection
    (zero shuffle, Arrow-batched) whose plan cost is independent of K —
    the 100 TB path for trained codebooks past ``LITERAL_CODEBOOK_MAX``.
    """
    if via == "auto":
        # OPTIMIZATION r18: numpy for every codebook size. The literal
        # projection embeds the codebook VALUES into the generated code,
        # so each Lloyd round's new centroids force a fresh Janino
        # compile (measured: 2.34 s first-run vs 0.95 via numpy at K=8,
        # sf0.1; hot runs 0.79 vs 0.66) — the numpy scorer's plan is
        # value-independent. Bit-identical by the pinned equality test;
        # 'literal' remains for explicit use/tests.
        via = "numpy"
    if via == "literal":
        a = _codebook_argmax_expr(cents)
        return df.withColumn("cell", -a.getField("nc"))

    cents = sorted(cents, key=lambda c: c[0])
    cent_ids = np.array([c[0] for c in cents], dtype=np.int64)
    C = np.vstack([np.array(c[1], dtype=np.int64) for c in cents])
    cqn = np.array([c[2] for c in cents], dtype=np.int64)
    in_cols = df.columns
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", cell long"

    # bound the m×K score matrix per matmul (~32 MB of float64) so huge
    # codebooks don't blow task memory — chunking rows keeps the matmul
    # fully vectorized over K, which is the expensive axis
    rows_per_chunk = max(1, 4_000_000 // max(1, len(cent_ids)))

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf[in_cols].reset_index(drop=True)
            cells = np.empty(len(pdf), dtype=np.int64)
            for lo in range(0, len(pdf), rows_per_chunk):
                chunk = pdf.iloc[lo : lo + rows_per_chunk]
                M = np.vstack(chunk["qv"].to_numpy()).astype(np.int64)
                qn = chunk["qn"].to_numpy(dtype=np.int64)
                s = (M @ C.T).astype(np.float64) / np.sqrt(
                    np.outer(qn, cqn).astype(np.float64)
                )
                cells[lo : lo + len(chunk)] = cent_ids[np.argmax(s, axis=1)]
            pdf = pdf.copy()
            pdf["cell"] = cells
            yield pdf

    return df.mapInPandas(score, out_schema)


def _seed_codebook(
    q: DataFrame, k_cells: int, dims: int | None, id_col: str
) -> tuple[list[tuple[int, list[int], int]], int]:
    """Codebook seed = the K lowest USABLE ids (qn > 0, width match) of a
    ``_with_quantized`` frame. Width pinning happens BEFORE picking
    members: an oracle-pinned caller passes ``dims`` so codebook
    MEMBERSHIP can't drift (the DuckDB side draws its codebook from the
    dims-filtered CTE); with dims=None the lowest usable id defines the
    width, deterministically. Bounded: ≤ k_cells rows collected."""
    cand = q.filter(F.col("qn") > 0).select(id_col, "qv", "qn")
    if dims is not None:
        cand = cand.filter(F.size("qv") == dims)
    seed_rows = sorted(
        cand.orderBy(id_col).limit(k_cells).collect(),
        key=lambda r: r[id_col],
    )
    if not seed_rows:
        # caller-facing: an empty/zero-norm corpus is a data problem the
        # caller must see even under `python -O` (ADVICE r12 #1 class)
        raise ValueError("semdedup: no usable codebook vectors")
    if dims is None:
        dims = len(seed_rows[0]["qv"])
        seed_rows = [r for r in seed_rows if len(r["qv"]) == dims]
    cents = [
        (int(r[id_col]), [int(x) for x in r["qv"]], int(r["qn"]))
        for r in seed_rows
    ]
    return cents, dims


def _lloyd_rounds(
    usable: DataFrame,
    cents: list[tuple[int, list[int], int]],
    dims: int,
    train_iters: int,
) -> list[tuple[int, list[int], int]]:
    """``train_iters`` Lloyd rounds on the quantized grid: assign by the
    current literal codebook (projection, no shuffle), per-cell
    elementwise BIGINT sums (ONE K-group shuffle), new centroid = the
    ROUNDED INTEGER mean ``floor(sum/n + 0.5)`` per dimension —
    computed as the EXACT integer floor division ``(2·s + n) fld (2·n)``
    (mathematically identical: (2s+n)/(2n) = s/n + 1/2 in the rationals,
    and Python's ``//`` floors), so the trained codebook is
    bit-reproducible and oracle-portable UNCONDITIONALLY — no 2⁵³
    float-precision ceiling on the per-cell sum (VERDICT r10 watchlist
    #1; the earlier ``math.floor(s/n + 0.5)`` was exact only while
    |s| < 2⁵³ ≈ 7×10¹³ rows per cell at int8 quantization). Python ints
    are arbitrary precision; the Spark-side BIGINT sum itself is the
    only overflow surface and |s| ≤ 127·n keeps it exact to n < 7×10¹⁶.
    A cell that empties, or whose mean rounds to the zero vector, keeps
    its previous centroid."""
    for _ in range(train_iters):
        sums = (
            _assign_cells(usable, cents, dims)
            .groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                *[
                    F.sum(F.element_at("qv", d + 1)).alias(f"__s{d}")
                    for d in range(dims)
                ],
            )
            .collect()  # bounded: ≤ k_cells rows — one row per cell
        )
        updated = {}
        for r in sums:
            n = int(r["__n"])
            nqv = [(2 * int(r[f"__s{d}"]) + n) // (2 * n) for d in range(dims)]
            nqn = sum(x * x for x in nqv)
            if nqn > 0:
                updated[int(r["cell"])] = (nqv, nqn)
        cents = [
            (cid, *updated[cid]) if cid in updated else (cid, cqv, cqn)
            for cid, cqv, cqn in cents
        ]
    return cents


#: Auto-K policy constants (VERDICT r10 #4 — MEASURED, see BASELINE.md
#: round-11 K-sweep table). target_cell sizes the per-cell numpy kernel:
#: an m-row cell costs an m×m int64 Gram + float64 cosine matrix
#: (~16 bytes/pair), so avg cell 1024 → ~16 MB per cell task at the
#: measured ~1.1× fixture skew, comfortably inside an executor core's
#: budget with ~4× headroom for skewier corpora. k_max bounds the
#: CODEBOOK, not the expression — past LITERAL_CODEBOOK_MAX the
#: assignment runs the broadcast-numpy scorer (plan cost independent of
#: K), so the binding constraints are the codebook's closure-capture
#: size (K·dims int64 ≈ 34 MB per task at the clamp, 64 dims) and the
#: K-row Lloyd aggregate. Past the clamp (N > 64 M rows/pass at
#: target 1024) shard the corpus on a coarse key (language/domain/
#: bucket) and semdedup each shard — the warning says so loudly.
SEMDEDUP_TARGET_CELL = 1024
SEMDEDUP_MAX_K = 65536


def auto_k_cells(
    n_rows: int,
    target_cell: int = SEMDEDUP_TARGET_CELL,
    k_min: int = 8,
    k_max: int = SEMDEDUP_MAX_K,
) -> int:
    """The measured K(N) rule for ``semdedup``: ``clamp(ceil(N /
    target_cell), k_min, k_max)``.

    Evidence (BASELINE.md round-11 K sweep, sf0.1 N=2000, iters=2,
    τ=0.4): recall 0.3425 / 0.2558 / 0.1976 at K = 8 / 16 / 32 with
    runtime flat (4.11 / 4.34 / 4.16 s min-of-3) — recall ONLY FALLS as
    K grows and the kernel is nowhere near the bottleneck at fixture
    scale, so K is chosen purely by the per-cell memory bound: the
    smallest K that keeps the expected cell (N/K rows → (N/K)² pair
    matrix) inside a task's budget. At the fixture SFs (N = 500 / 500 /
    2000) the rule gives k_min = 8 — exactly the registered entries'
    oracle constant (pinned by tests/test_semdedup.py) — and first moves
    at N > k_min·target_cell = 8192 rows.
    """
    if n_rows <= 0:
        return k_min
    k = max(k_min, min(k_max, -(-n_rows // target_cell)))
    if n_rows > k_max * target_cell:
        import warnings

        warnings.warn(
            f"semdedup auto-K clamped at k_max={k_max}: N={n_rows} gives "
            f"avg cell {n_rows // k_max} > target {target_cell} and the "
            "per-cell kernel will exceed its memory budget — shard the "
            "corpus on a coarse key (language/domain/LSH bucket) and "
            "semdedup each shard, or raise target_cell knowingly",
            stacklevel=2,
        )
    return k


def semdedup(
    vectors: DataFrame,
    k_cells: int | None = 8,
    tau: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
    train_iters: int = 0,
) -> DataFrame:
    """SemDeDup-style semantic dedup: (id, cell, dup_of, keep) per vector.

    The one dedup modality the lexical family (MinHash/SimHash/Jaccard)
    can't express: duplicates in EMBEDDING space. Pipeline, composed from
    three proven pieces:

    1. **Quantize** every vector on the int8 max-abs grid
       (`operators/inference.py` — the oracle-portable quantizer), so all
       dot products are exact BIGINT math and cosines are bit-identical
       across engines (CAST to double is exact: |dot| ≤ 64·127² < 2⁵³).
    2. **Assign to a cell**: the codebook seed is the K LOWEST usable ids
       (deterministic; ``train_iters`` Lloyd rounds — see below — move it
       toward genuine k-means centroids). The codebook is a bounded
       driver-side collect (K rows); assignment is a pure projection over
       the scan — ZERO corpus shuffle, no N×K intermediate, no window —
       via a LITERAL array-of-struct expression for small K, or the
       bit-identical broadcast-numpy ``mapInPandas`` scorer past
       ``LITERAL_CODEBOOK_MAX`` (see ``_assign_cells``). At 100 TB this
       is the codebook-broadcast pattern every IVF/k-means scorer uses.
    3. **Per-cell pairs only, never as Spark rows**: one shuffle groups
       vectors by ``cell``; each cell's pair matrix is scored INSIDE numpy
       (``applyInPandas`` — int64 matmul, exact) and only the per-vector
       verdict comes back. A vector's ``dup_of`` is the LOWEST id that
       covers it at quantized cosine ≥ tau (drop-if-any-earlier-neighbor —
       the same greedy representative rule as ``dedup_cleaned_corpus``).
       This mirrors ``neardup_pairs_cosine``'s design rule: the O(Σ|cell|²)
       pair set never materializes as rows and never crosses the Arrow
       boundary. (A first cut as a cell self-equi-join + per-pair JVM
       ``aggregate(zip_with(...))`` was measured 47 s at sf0.1 — Catalyst
       interprets higher-order functions per row; the numpy cell kernel
       reads ~2 s on the identical result.) Work is Σ|cell|² — never
       corpus × corpus; K grows with N to bound cell size (the per-cell
       matrix is m×m doubles, so size K for m in the low thousands).

    ``train_iters`` > 0 runs that many LLOYD ROUNDS on the quantized
    grid before the final assignment (VERDICT r9 #2: id-seeded cells
    measured recall 0.285 at sf0.1/K=8/τ=0.4 — trained centroids lift
    it; see BASELINE.md round-10 notes for the measured numbers). Each
    round: assign by the current literal codebook (projection, no
    shuffle), per-cell elementwise BIGINT sums (ONE K-group shuffle),
    then the new centroid is the ROUNDED INTEGER mean
    ``floor(sum/n + 0.5)`` per dimension — computed as the exact integer
    floor division ``(2·s + n) fld (2·n)`` on exact int64 sums (no
    float division anywhere), so the trained codebook is
    bit-reproducible and oracle-portable unconditionally: integer
    addition commutes and the rounding never touches IEEE arithmetic,
    with no 2⁵³ ceiling on the per-cell sum. A cell that empties, or whose
    mean rounds to the zero vector, keeps its previous centroid. Per
    round cost at 100 TB: one corpus pass + a K-row collect — the
    standard distributed-k-means shape (cf. PageRank's bounded rounds).

    Vectors that cannot participate in cosine math (dims ≠ codebook dims,
    or an all-zero quantization) are filtered out up front — explicitly,
    identically in the oracle — instead of leaking NaN/NULL orderings.

    Exactness across engines: the numpy path computes the same numbers as
    the SQL oracle because every dot is int64 (exact), the cast to double
    is exact (|dot| ≤ dims·127² < 2⁵³), and sqrt/divide are
    correctly-rounded IEEE ops on identical inputs.
    """
    q = _with_quantized(vectors, id_col, vec_col)
    if k_cells is None:
        # auto-K (measured policy — see auto_k_cells) from the RAW row
        # count: Catalyst serves an unfiltered parquet count from footer
        # metadata (no scan, no quantization pass — .explain shows a
        # LocalTableScan over the aggregated statistics), and a raw count
        # ≥ the usable pool, i.e. an upper bound — exactly what a
        # cell-size BUDGET wants. Counting the qn>0 pool instead would
        # burn a full quantization pass just to pick K.
        k_cells = auto_k_cells(vectors.count())
    cents, dims = _seed_codebook(q, k_cells, dims, id_col)

    usable = q.filter((F.size(vec_col) == dims) & (F.col("qn") > 0)).select(
        id_col, "qv", "qn"
    )
    if train_iters > 0:
        # every Lloyd round + the final assignment re-reads the quantized
        # corpus: persist ONE materialization instead of re-scanning and
        # re-quantizing per round (tracked → released by the sweep's
        # scoped release, not a global clearCache)
        usable = track_persist(usable)

    cents = _lloyd_rounds(usable, cents, dims, train_iters)
    assigned = _assign_cells(usable, cents, dims).select(
        id_col, "qv", "qn", "cell"
    )

    def dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        M = np.vstack(pdf["qv"].to_numpy()).astype(np.int64)
        qn = pdf["qn"].to_numpy(dtype=np.int64)
        # exact int64 Gram matrix; cast + sqrt + divide identical to the
        # JVM/DuckDB expression on the same integers
        cos = (M @ M.T).astype(np.float64) / np.sqrt(
            np.outer(qn, qn).astype(np.float64)
        )
        covered = np.triu(cos >= tau, k=1)  # row i covers column j, i < j
        has_dup = covered.any(axis=0)
        first = covered.argmax(axis=0)  # ids sorted asc → argmax = min id
        dup_of = pd.array(
            [ids[first[j]] if has_dup[j] else None for j in range(len(ids))],
            dtype="Int64",
        )
        return pd.DataFrame(
            {
                id_col: ids,
                "cell": pdf["cell"].to_numpy(dtype=np.int64),
                "dup_of": dup_of,
                "keep": (~has_dup).astype(np.int32),
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        dedup_cell, f"{id_col} long, cell long, dup_of long, keep int"
    )


def semdedup_incremental(
    base: DataFrame,
    new: DataFrame,
    k_cells: int | None = 8,
    tau: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
    train_iters: int = 0,
    strict: bool = False,
) -> DataFrame:
    """Incremental SemDeDup: verdicts for a NEW delta against an
    already-compacted BASE — the 100 TB compaction story (you never
    re-dedup the whole corpus; ``dedup_incremental`` is the lexical
    analogue). Returns (id, cell, dup_of, keep) for NEW rows only.

    Semantics = ``semdedup`` under a virtual ordering that places every
    base vector before every new one: a new vector is dropped iff covered
    (quantized cosine ≥ tau, same cell) by ANY base vector (dup_of = the
    lowest covering base id) or, failing that, by a LOWER-ID new vector.
    Base verdicts are never re-opened; base/new ids must be disjoint
    (caller contract — the registry entry splits on md5 parity). The
    per-cell kernel GUARDS the common violation: an id carried on both
    sides with the SAME payload lands in the same cell twice (identical
    vector → identical quantization → identical argmax) and raises
    ``ValueError`` instead of silently emitting the plausible-looking
    self-coverage verdict (cosine 1.0, dup_of = own id). The guard is
    deliberately zero-extra-jobs and therefore NOT exhaustive: an
    overlapping id whose vector CHANGED between sides (a re-embedded
    record) can land in different cells and passes unseen. A caller who
    can't guarantee disjointness passes ``strict=True`` (VERDICT r11
    #5): ONE extra semi-join count up front that raises on ANY id
    overlap — including the changed-vector case the free kernel guard
    can't see — at the cost of one job before any dedup work; the
    default stays False to keep the incremental hot path zero-extra-jobs
    (the registry entry's md5-parity split is disjoint by construction).
    Re-embeds are a delete + insert, not an incremental delta.

    The scale win is what the kernel does NOT compute: per cell the Gram
    work is |base|·|new| + |new|² — never |base|² (on a daily delta
    against a huge corpus, base² IS the cost incremental compaction
    exists to avoid). The codebook is seeded AND Lloyd-trained on BASE
    ONLY, then frozen for assignment of both sides: training on the
    union would move cell boundaries and silently invalidate the base's
    prior verdicts — the same frozen-index discipline every IVF
    compaction uses. Composition caveat (ADVICE r10): chaining passes
    reproduces the one-shot greedy over the union EXACTLY only when the
    base retains ALL prior rows (kept and dropped) and the codebook /
    cell assignment is identical to the one-shot's; a kept-rows-only
    base under a base-trained frozen codebook is an APPROXIMATION — the
    one-shot lets a dropped earlier vector cover a later one and trains
    on the union, so it can drop (or re-cell) a vector this pass keeps.
    """
    if strict:
        # opt-in exhaustive disjointness check: catches a re-embedded id
        # (different vector → possibly different cell) the zero-cost
        # kernel guard below cannot. One bounded job: semi-join on id,
        # fetch at most 10 offenders for the message.
        overlap = (
            new.select(id_col)
            .join(base.select(id_col), id_col, "left_semi")
            .limit(10)
            .collect()
        )
        if overlap:
            raise ValueError(
                "semdedup_incremental(strict=True): base/new ids must be "
                f"disjoint; overlapping ids (first 10): "
                f"{sorted(int(r[id_col]) for r in overlap)} — re-embeds "
                "are a delete + insert, not an incremental delta"
            )
    qb = _with_quantized(base, id_col, vec_col)
    if k_cells is None:
        # auto-K from the BASE side's row count (the frozen-codebook
        # side). Metadata-served only when base is an unfiltered scan —
        # a filtered base pays a thin count pass (filter + count, no
        # quantization); callers on the incremental hot path should pass
        # k_cells explicitly (the compacted base's K is already known
        # from the pass that built it — re-deriving it per delta is
        # wasted work AND risks moving cell boundaries).
        k_cells = auto_k_cells(base.count())
    cents, dims = _seed_codebook(qb, k_cells, dims, id_col)

    usable_b = qb.filter(
        (F.size(vec_col) == dims) & (F.col("qn") > 0)
    ).select(id_col, "qv", "qn")
    if train_iters > 0:
        usable_b = track_persist(usable_b)
    cents = _lloyd_rounds(usable_b, cents, dims, train_iters)

    qn_ = _with_quantized(new, id_col, vec_col)
    usable_n = qn_.filter(
        (F.size(vec_col) == dims) & (F.col("qn") > 0)
    ).select(id_col, "qv", "qn")

    both = _assign_cells(
        usable_b.withColumn("is_new", F.lit(0)).unionByName(
            usable_n.withColumn("is_new", F.lit(1))
        ),
        cents,
        dims,
    ).select(id_col, "qv", "qn", "cell", "is_new")

    def dedup_cell_incr(pdf: pd.DataFrame) -> pd.DataFrame:
        nd = pdf[pdf["is_new"] == 1].sort_values(id_col)
        empty = pd.DataFrame(
            {
                id_col: pd.Series([], dtype="int64"),
                "cell": pd.Series([], dtype="int64"),
                "dup_of": pd.array([], dtype="Int64"),
                "keep": pd.Series([], dtype="int32"),
            }
        )
        if not len(nd):
            return empty
        ids_n = nd[id_col].to_numpy(dtype=np.int64)
        N = np.vstack(nd["qv"].to_numpy()).astype(np.int64)
        nqn = nd["qn"].to_numpy(dtype=np.int64)
        dup = np.full(len(ids_n), -1, dtype=np.int64)

        bd = pdf[pdf["is_new"] == 0]
        if len(bd):
            ids_b = bd[id_col].to_numpy(dtype=np.int64)
            # caller-contract guard (ADVICE r10): an id on both sides
            # lands in the SAME cell (identical vector → identical
            # quantization → identical argmax), so checking inside the
            # kernel catches every violation with zero extra Spark jobs
            overlap = np.intersect1d(ids_b, ids_n)
            if len(overlap):
                raise ValueError(
                    "semdedup_incremental: base/new ids must be disjoint; "
                    f"overlapping ids (first 10): {overlap[:10].tolist()}"
                )
            B = np.vstack(bd["qv"].to_numpy()).astype(np.int64)
            bqn = bd["qn"].to_numpy(dtype=np.int64)
            # |base|·|new| scores — the only base work in the whole pass
            cos_bn = (B @ N.T).astype(np.float64) / np.sqrt(
                np.outer(bqn, nqn).astype(np.float64)
            )
            cov_b = cos_bn >= tau
            for j in range(len(ids_n)):
                if cov_b[:, j].any():
                    dup[j] = int(ids_b[cov_b[:, j]].min())

        cos_nn = (N @ N.T).astype(np.float64) / np.sqrt(
            np.outer(nqn, nqn).astype(np.float64)
        )
        cov_n = np.triu(cos_nn >= tau, k=1)
        for j in range(len(ids_n)):
            # base cover wins (virtual ordering: base < new); else the
            # LOWEST-id covering new vector (ids sorted asc → argmax)
            if dup[j] < 0 and cov_n[:, j].any():
                dup[j] = int(ids_n[cov_n[:, j].argmax()])

        return pd.DataFrame(
            {
                id_col: ids_n,
                "cell": nd["cell"].to_numpy(dtype=np.int64),
                "dup_of": pd.array(
                    [None if d < 0 else int(d) for d in dup], dtype="Int64"
                ),
                "keep": (dup < 0).astype(np.int32),
            }
        )

    return both.groupBy("cell").applyInPandas(
        dedup_cell_incr, f"{id_col} long, cell long, dup_of long, keep int"
    )


#: Guard on the sharded seed collect: shard keys must be LOW-cardinality
#: (language, domain, source) — n_shards·k_cells rows come to the driver.
SHARDED_SEED_MAX_ROWS = 100_000


def _assign_cells_sharded(
    df: DataFrame, cents_by_shard: dict, shard_col: str
) -> DataFrame:
    """Per-shard cell assignment: the broadcast-numpy scorer of
    ``_assign_cells(via='numpy')`` with one codebook PER SHARD (rows
    grouped by the shard key inside each Arrow batch, each group scored
    against its own codebook — same exact int64/IEEE math and
    (s DESC, cent_id ASC) tie-break, bit-identical to a per-shard
    literal argmax). Zero corpus shuffle."""
    cb = {
        s: (
            np.array([c[0] for c in cents], dtype=np.int64),
            np.vstack([np.array(c[1], dtype=np.int64) for c in cents]),
            np.array([c[2] for c in cents], dtype=np.int64),
        )
        for s, cents in cents_by_shard.items()
    }
    in_cols = df.columns
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", cell long"

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf[in_cols].reset_index(drop=True)
            cells = np.empty(len(pdf), dtype=np.int64)
            for s, idx in pdf.groupby(shard_col).groups.items():
                cent_ids, C, cqn = cb[s]
                sub = pdf.loc[idx]
                M = np.vstack(sub["qv"].to_numpy()).astype(np.int64)
                qn = sub["qn"].to_numpy(dtype=np.int64)
                sc = (M @ C.T).astype(np.float64) / np.sqrt(
                    np.outer(qn, cqn).astype(np.float64)
                )
                cells[np.asarray(idx, dtype=np.int64)] = cent_ids[
                    np.argmax(sc, axis=1)
                ]
            pdf = pdf.copy()
            pdf["cell"] = cells
            yield pdf

    return df.mapInPandas(assign, out_schema)


def _lloyd_rounds_sharded(
    usable: DataFrame,
    cents_by_shard: dict,
    dims: int,
    train_iters: int,
    shard_col: str,
    id_col: str,
) -> dict:
    """Per-shard Lloyd rounds — the one-shot ``_lloyd_rounds`` with the
    shard key added to the aggregate: assign by the current per-shard
    codebooks (projection), per-(shard, cell) elementwise BIGINT sums
    (ONE grouped shuffle, ≤ n_shards·K rows collected), new centroid =
    the exact integer floor division ``(2·s + n) fld (2·n)`` per
    dimension. A cell that empties or rounds to zero keeps its previous
    centroid — shard by shard, exactly the one-shot rule, so training a
    shard here equals training ``semdedup`` on that shard alone."""
    for _ in range(train_iters):
        sums = (
            _assign_cells_sharded(usable, cents_by_shard, shard_col)
            .groupBy(shard_col, "cell")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                *[
                    F.sum(F.element_at("qv", d + 1)).alias(f"__s{d}")
                    for d in range(dims)
                ],
            )
            .collect()  # bounded: ≤ n_shards·k_cells rows
        )
        updated: dict = {}
        for r in sums:
            n = int(r["__n"])
            nqv = [(2 * int(r[f"__s{d}"]) + n) // (2 * n) for d in range(dims)]
            nqn = sum(x * x for x in nqv)
            if nqn > 0:
                updated[(r[shard_col], int(r["cell"]))] = (nqv, nqn)
        cents_by_shard = {
            s: [
                (cid, *updated[(s, cid)])
                if (s, cid) in updated
                else (cid, cqv, cqn)
                for cid, cqv, cqn in cents
            ]
            for s, cents in cents_by_shard.items()
        }
    return cents_by_shard


def semdedup_sharded(
    vectors: DataFrame,
    shard_col: str = "label",
    k_cells: int = 8,
    tau: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
    train_iters: int = 0,
) -> DataFrame:
    """Sharded SemDeDup: (id, shard, cell, dup_of, keep) — independent
    semantic dedup PER SHARD, the scale pattern ``auto_k_cells``'s clamp
    warning prescribes for corpora past k_max·target_cell rows.

    Shard on a coarse, semantically-closed key (language / domain /
    source): cross-shard near-dups are rare by construction there, so
    restricting coverage to within-shard loses little recall while
    bounding EVERYTHING per shard — each shard gets its own K-lowest-id
    codebook (seeded via one windowed rank, collected bounded at
    n_shards·k_cells rows and guarded by ``SHARDED_SEED_MAX_ROWS``), the
    assignment is one broadcast-numpy ``mapInPandas`` projection scoring
    each row against ITS shard's codebook (zero corpus shuffle, same
    exact int64/IEEE math as ``_assign_cells`` — bit-identical to a
    per-shard literal argmax), and the pair kernel groups by
    (shard, cell) so the Σ|cell|² work is per-shard. A duplicate pair
    SPLIT ACROSS SHARDS is deliberately not detected — that is the
    shard contract, identical to running ``semdedup`` per language.
    Ids must be unique within a shard; the guard enforces this for the
    SEED ZONE only (rank ≤ k_cells per shard — driver-side on rows the
    seed collect already holds, zero extra jobs). A duplicate id
    outside the seed zone passes undetected and its verdict rows are
    ambiguous (ADVICE r12) — full enforcement would cost an extra
    corpus-wide aggregation; callers who can't guarantee uniqueness
    should exact-dedup on (shard, id) first.

    NULL shard keys are excluded with the same loudness as unusable
    vectors (documented, mirrored in the oracle's inner join + IS NOT
    NULL). ``train_iters`` runs per-shard Lloyd rounds
    (``_lloyd_rounds_sharded`` — the one-shot trainer with the shard key
    in the aggregate, exact integer means); training a shard here equals
    training ``semdedup`` on that shard alone, pinned by the composition
    test. The staged registry entry keeps train_iters=0 (its oracle pins
    the id-seeded codebook); the dedup verdict rule, quantization grid,
    and tie-breaks are byte-identical to ``semdedup``'s either way.
    """
    q = _with_quantized(
        vectors.filter(F.col(shard_col).isNotNull()), id_col, vec_col,
        shard_col,
    )
    if dims is None:
        # deterministic width pin: the lowest usable id overall (same
        # rule as _seed_codebook's dims=None path)
        first = (
            q.filter(F.col("qn") > 0)
            .orderBy(id_col)
            .select(F.size(vec_col).alias("w"))
            .limit(1)
            .collect()
        )
        if not first:
            # caller-facing contract (ADVICE r11): raise a real error —
            # plain assert strips under `python -O` and the failure would
            # then surface as an opaque KeyError far from the cause
            raise ValueError("semdedup_sharded: no usable vectors")
        dims = int(first[0]["w"])
    usable = q.filter((F.size(vec_col) == dims) & (F.col("qn") > 0)).select(
        id_col, shard_col, "qv", "qn"
    )

    rk = F.row_number().over(
        Window.partitionBy(shard_col).orderBy(F.col(id_col).asc())
    )
    # Seed selection in two phases so the rank shuffle carries only TWO
    # THIN COLUMNS (shard, id) — never the qv arrays; at 100 TB the
    # window's exchange is the dominant cost of seeding and qv is ~100×
    # the width of the key pair. The heavy columns are then fetched by a
    # broadcast semi-join over the (tiny) seed-id set: one pruned scan,
    # zero corpus shuffle. Measured sf0.1: shuffle bytes for the seed
    # stage drop from the full frame to the key pair.
    seed_ids = (
        usable.select(shard_col, id_col)
        .withColumn("__rk", rk)
        .filter(F.col("__rk") <= k_cells)
        .select(shard_col, id_col)
    )
    # fetch on (shard, id) — not id alone (ADVICE r11): ids are expected
    # globally unique, but if a seed id ALSO exists in another shard an
    # id-only join would inject a non-K-lowest centroid into that shard's
    # codebook and silently diverge from the documented rule/oracle. The
    # composite key makes the fetch correct even then; true duplicates
    # WITHIN a shard are caught by the explicit (shard, id) uniqueness
    # check below.
    seed_rows = (
        usable.join(F.broadcast(seed_ids), [shard_col, id_col])
        .select(shard_col, id_col, "qv", "qn")
        .limit(SHARDED_SEED_MAX_ROWS + 1)
        .collect()  # bounded: ≤ n_shards·k_cells rows (guarded below)
    )
    if len(seed_rows) > SHARDED_SEED_MAX_ROWS:
        # caller-facing contract (ADVICE r11): must survive `python -O` —
        # the limit above is already applied, so an assert-stripped run
        # would silently truncate the codebook and KeyError downstream
        raise ValueError(
            "semdedup_sharded: seed collect exceeded SHARDED_SEED_MAX_ROWS"
            f" — shard key '{shard_col}' is too high-cardinality for "
            "per-shard codebooks; shard on a coarser key"
        )
    # id uniqueness WITHIN a shard (review r12): a duplicated id in the
    # seed zone fetches BOTH payload rows through the equi-join (the rank
    # window numbered them 1 and 2 with a nondeterministic tiebreak), so
    # the codebook would silently grow past k_cells with two same-id,
    # possibly different-payload centroids — a hash mismatch with nothing
    # pointing at the cause. The collect above already holds every fetched
    # row, so the check is driver-side and free of extra jobs.
    seed_keys = [(r[shard_col], r[id_col]) for r in seed_rows]
    if len(seed_keys) != len(set(seed_keys)):
        from collections import Counter

        dupes = [k for k, c in Counter(seed_keys).items() if c > 1][:10]
        raise ValueError(
            "semdedup_sharded: duplicate ids within a shard's seed zone "
            f"(first 10 (shard, id) offenders: {dupes}) — dedup the "
            "input first. NOTE: uniqueness is enforced for SEED-ZONE ids "
            "only (rank <= k_cells per shard; full enforcement would "
            "cost an extra aggregation job) — a duplicate id outside the "
            "seed zone is not detected here and yields ambiguous "
            "verdict rows for that id"
        )
    cents_by_shard: dict = {}
    for r in sorted(seed_rows, key=lambda r: (r[shard_col], r[id_col])):
        cents_by_shard.setdefault(r[shard_col], []).append(
            (int(r[id_col]), [int(x) for x in r["qv"]], int(r["qn"]))
        )

    if train_iters > 0:
        usable = track_persist(usable)
        cents_by_shard = _lloyd_rounds_sharded(
            usable, cents_by_shard, dims, train_iters, shard_col, id_col
        )
    assigned = _assign_cells_sharded(usable, cents_by_shard, shard_col)
    shard_t = usable.schema[shard_col].dataType.simpleString()

    def dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        M = np.vstack(pdf["qv"].to_numpy()).astype(np.int64)
        qn = pdf["qn"].to_numpy(dtype=np.int64)
        cos = (M @ M.T).astype(np.float64) / np.sqrt(
            np.outer(qn, qn).astype(np.float64)
        )
        covered = np.triu(cos >= tau, k=1)
        has_dup = covered.any(axis=0)
        first = covered.argmax(axis=0)
        dup_of = pd.array(
            [ids[first[j]] if has_dup[j] else None for j in range(len(ids))],
            dtype="Int64",
        )
        return pd.DataFrame(
            {
                id_col: ids,
                "shard": pdf[shard_col].to_numpy(),
                "cell": pdf["cell"].to_numpy(dtype=np.int64),
                "dup_of": dup_of,
                "keep": (~has_dup).astype(np.int32),
            }
        )

    return assigned.groupBy(shard_col, "cell").applyInPandas(
        dedup_cell,
        f"{id_col} long, shard {shard_t}, cell long, dup_of long, keep int",
    )
