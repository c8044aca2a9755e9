"""Similarity-search queries over the embeddings table (north-star
extension): exact cosine top-k, all-pairs near-dup, and sign-LSH buckets.

Floating-point parity: every dot product / norm is a SEQUENTIAL left fold
over the array in both engines (Spark ``aggregate`` ↔ DuckDB ``list_reduce``
over a 0-prepended product list), so the accumulation order — and therefore
every rounding step — is identical, and the oracle compares cosine VALUES,
not just neighbor ids. sqrt and division are correctly-rounded IEEE ops on
identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineer_development_spark.functions.portable_hash import hyperplane
from data_engineer_development_spark.operators import similarity as S
from data_engineer_development_spark.sources import load_table

DIMS = 64
TOPK = 5
QUERY_IDS = [1, 2, 3, 4, 5]
COSINE_TAU = 0.4
PLANES = 8


def _duck_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, {DIMS}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
        f"(acc, v) -> acc + v)"
    )


def _duck_norm(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, {DIMS}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))), "
        f"(acc, v) -> acc + v))"
    )


def _duck_cosine(a: str, b: str) -> str:
    return f"({_duck_dot(a, b)} / ({_duck_norm(a)} * {_duck_norm(b)}))"


# --------------------------------------------------------------------------
# Exact top-k cosine neighbors (brute force, query side broadcast).
# --------------------------------------------------------------------------
def q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk(vecs, QUERY_IDS, TOPK).orderBy("query_id", "rk")


_SIM_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id IN ({", ".join(map(str, QUERY_IDS))})),
scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                  {_duck_cosine('q.qv', 'e.embedding')} AS cosine
           FROM q CROSS JOIN embeddings e WHERE q.query_id <> e.vec_id),
ranked AS (SELECT query_id, neighbor_id, cosine,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS rk
           FROM scored)
SELECT query_id, rk, neighbor_id, cosine FROM ranked WHERE rk <= {TOPK}
ORDER BY query_id, rk
"""


# --------------------------------------------------------------------------
# All-pairs cosine near-dup (exactness baseline for embedding dedup).
# --------------------------------------------------------------------------
def q_sim_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = load_table(spark, sf_dir, "embeddings")
    return S.neardup_pairs_cosine(vecs, COSINE_TAU).orderBy("id1", "id2")


_SIM_NEARDUP_SQL = f"""
SELECT a.vec_id AS id1, b.vec_id AS id2,
       {_duck_cosine('a.embedding', 'b.embedding')} AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_duck_cosine('a.embedding', 'b.embedding')} >= {COSINE_TAU}
ORDER BY id1, id2
"""


# --------------------------------------------------------------------------
# Sign-LSH bucket histogram (verifies the fixed-hyperplane bucketing math —
# the scale path that replaces all-pairs at 100 TB).
# --------------------------------------------------------------------------
def q_sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = load_table(spark, sf_dir, "embeddings")
    return (
        S.bucket_assign(vecs, planes=PLANES, dims=DIMS)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
        .orderBy("bucket")
    )


def _lsh_buckets_sql() -> str:
    bit_cols = []
    for pidx in range(PLANES):
        w = hyperplane(pidx, DIMS)
        terms = " + ".join(
            f"CAST(embedding[{d + 1}] AS DOUBLE) * ({w[d]!r})" for d in range(DIMS)
        )
        bit_cols.append(f"(CASE WHEN ({terms}) >= 0 THEN {1 << pidx} ELSE 0 END)")
    bucket = " + ".join(bit_cols)
    return f"""
WITH b AS (SELECT vec_id, {bucket} AS bucket FROM embeddings)
SELECT bucket, count(*) AS n_vectors, min(vec_id) AS min_vec_id
FROM b GROUP BY bucket ORDER BY bucket
"""


QUERIES = {
    "sim_cosine_topk": q_sim_cosine_topk,
    "sim_neardup": q_sim_neardup,
    "sim_lsh_buckets": q_sim_lsh_buckets,
}

ORACLE = {
    "sim_cosine_topk": _SIM_TOPK_SQL,
    "sim_neardup": _SIM_NEARDUP_SQL,
    "sim_lsh_buckets": _lsh_buckets_sql(),
}
