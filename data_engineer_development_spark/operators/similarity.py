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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_engineer_development_spark.functions.portable_hash import hyperplane


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


def cosine_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (self excluded).
    The query side is broadcast; ranking is deterministic (score desc, id)."""
    q = vectors.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine("qv", "nv"))
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
) -> DataFrame:
    """Sign-LSH bucket id: bit p = (v · hyperplane_p >= 0). Hyperplanes are
    fixed md5-derived 3-decimal literals (portable to the oracle)."""
    out = vectors
    bit_cols = []
    for pidx in range(planes):
        w = hyperplane(pidx, dims)
        terms = " + ".join(
            f"cast(element_at({vec_col}, {d + 1}) as double) * ({w[d]!r})"
            for d in range(dims)
        )
        bit_cols.append(f"(case when ({terms}) >= 0 then {1 << pidx} else 0 end)")
    return out.withColumn("bucket", F.expr(" + ".join(bit_cols)))


def neardup_pairs_cosine(
    vectors: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh: bool = False,
    planes: int = 4,
    dims: int = 64,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ tau, id1 < id2.

    ``use_lsh=True`` restricts candidate pairs to same-bucket (the scale
    path; recall < 1 by design). Default is the exact all-pairs comparison.
    """
    if use_lsh:
        v = bucket_assign(vectors, planes=planes, dims=dims, vec_col=vec_col)
        a = v.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"), "bucket")
        b = v.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"), "bucket")
        pairs = a.join(b, "bucket").filter(F.col("id1") < F.col("id2"))
    else:
        a = vectors.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
        b = vectors.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
        pairs = a.crossJoin(b).filter(F.col("id1") < F.col("id2"))
    return (
        pairs.withColumn("cosine", cosine("v1", "v2"))
        .filter(F.col("cosine") >= tau)
        .select("id1", "id2", "cosine")
    )
