"""Training-mix operators, wave 6 (north-star extension): domain-mix
resampling, sequence packing into fixed context windows, and Z-order
layout keys for data-skipping.

These are the layout/composition stage of a training-data pipeline —
after dedup and quality filtering (waves 2-5) the corpus is re-weighted
across domains, packed into context-length sequences, and laid out on
disk so scans prune. Reference scope: the reference pipeline ends at
dimensional tables (export_svg.py); these extend it to the corpus-prep
surface the assignment names first-class.

Cross-engine exactness follows the house rules: md5 portable hashes for
anything randomized (functions/portable_hash.py), integer arithmetic
bounded below 2^63, no double->int CASTs (Spark truncates, DuckDB
rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineer_development_spark.functions.portable_hash import (
    duck_md5_int,
    spark_md5_int,
)
from data_engineer_development_spark.functions.scalars import dsum
from data_engineer_development_spark.sources import load_table


# --------------------------------------------------------------------------
# Domain-mix resampling: re-weight the corpus across sources by keeping a
# deterministic hash-threshold fraction of each domain (the "sample web at
# 30%, keep books at 100%" move). Pure scan + filter + one partial-agg
# shuffle of #domains rows — at 100 TB the filter runs at scan speed and
# the report shuffle is O(#domains), not O(#docs). Rates live in ONE dict
# so the Spark CASE and the oracle CASE are generated from the same data.
# --------------------------------------------------------------------------
_MIX_RATES = {  # source -> keep percentage
    **{f"src{i}": 100 for i in range(0, 20, 4)},  # keep whole
    **{f"src{i}": 50 for i in range(1, 20, 4)},  # half
    **{f"src{i}": 25 for i in range(2, 20, 4)},  # quarter
    **{f"src{i}": 10 for i in range(3, 20, 4)},  # decimate
}


def _rate_case() -> str:
    # identical text parses identically in Spark SQL and DuckDB
    arms = " ".join(
        f"WHEN '{s}' THEN {r}" for s, r in sorted(_MIX_RATES.items())
    )
    return f"CASE source {arms} ELSE 0 END"


def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain mix report after hash-threshold resampling.

    Keep doc iff md5(doc_id) % 100 < rate(source); report surviving
    docs + chars per domain, which IS the achieved training mix.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = spark_md5_int("cast(doc_id as string)")
    return (
        docs.withColumn("rate", F.expr(_rate_case()))
        .filter(F.expr(f"{h} % 100") < F.col("rate"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs_kept"),
            F.sum("n_chars").alias("chars_kept"),
            F.first("rate").alias("target_pct"),
        )
        .orderBy("source")
    )


_DOMAIN_MIX_SQL = f"""
WITH d AS (SELECT source, n_chars, {_rate_case()} AS rate
           FROM documents
           WHERE {duck_md5_int('CAST(doc_id AS VARCHAR)')} % 100
                 < {_rate_case()})
SELECT source, COUNT(*) AS docs_kept,
       CAST(SUM(n_chars) AS BIGINT) AS chars_kept,
       CAST(MIN(rate) AS INT) AS target_pct
FROM d GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------------------
# Sequence packing: assign documents to fixed-capacity context windows per
# shard ("concat the token stream, chunk every CAP tokens" — the GPT-style
# packing discipline). Shard by portable hash so packing parallelizes;
# within a shard the cumulative token count over a deterministic order
# yields seq_id = floor((cumsum - tokens) / CAP) with ONE window pass — no
# driver loop, no UDF. At 100 TB: #shards partitions, each a single
# sort + running sum; the report agg is O(#sequences).
# --------------------------------------------------------------------------
_PACK_SHARDS = 8
_PACK_CAP = 512  # tokens per context window


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            f"{spark_md5_int('cast(doc_id as string)')} % {_PACK_SHARDS}"
        ).alias("shard"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = docs.withColumn("run", F.sum("tokens").over(w)).withColumn(
        "seq_id", F.floor((F.col("run") - F.col("tokens")) / _PACK_CAP)
    )
    return (
        packed.groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard", "seq_id")
    )


_PACK_SQL = f"""
WITH d AS (SELECT doc_id,
                  {duck_md5_int('CAST(doc_id AS VARCHAR)')}
                      % {_PACK_SHARDS} AS shard,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
           FROM documents),
p AS (SELECT *, SUM(tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS run
      FROM d)
SELECT shard, CAST(floor((run - tokens) / {_PACK_CAP}) AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs, CAST(SUM(tokens) AS BIGINT) AS seq_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM p GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# GLOBAL sequence packing — ROUND-13+ REGISTRATION CANDIDATE (staged,
# r12): the sharded entry above parallelizes by hashing documents into
# _PACK_SHARDS independent streams, which caps parallelism at #shards —
# each shard's running sum is ONE task's window, i.e. corpus/#shards
# rows through a single sort at 100 TB. This variant packs the TRUE
# single concatenated stream (the GPT-style discipline exactly: one
# global token stream cut every CAP tokens, documents allowed to
# STRADDLE a cut) with NO unpartitioned window anywhere: the exclusive
# global prefix sum comes from operators/ranking.with_global_cumsum
# (range shuffle + per-physical-partition local window + a P-row offsets
# broadcast — the distributed zipWithIndex idiom extended to weights).
# Per document: its sequence, its byte^Wtoken offset within it, and
# whether it straddles a boundary (the fraction a packing owner watches
# — straddled docs lose attention contiguity). All-integer except the
# flag; the oracle is the naive global window, exact at fixture scale.
# --------------------------------------------------------------------------
def q_pack_sequences_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineer_development_spark.operators.ranking import (
        with_global_cumsum,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("tokens"),
    )
    cum = with_global_cumsum(docs, "tokens", "doc_id", cum_col="cum_before")
    seq = F.floor(F.col("cum_before") / _PACK_CAP)
    seq_last = F.floor(
        (F.col("cum_before") + F.col("tokens") - 1) / _PACK_CAP
    )
    return cum.select(
        "doc_id",
        "tokens",
        "cum_before",
        seq.cast("long").alias("seq_id"),
        (F.col("cum_before") % _PACK_CAP).cast("long").alias("seq_offset"),
        (seq != seq_last).alias("straddles"),
    ).orderBy("doc_id")


_PACK_GLOBAL_SQL = f"""
WITH d AS (SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
           FROM documents),
p AS (SELECT *, CAST(COALESCE(SUM(tokens) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS BIGINT) AS cum_before
      FROM d)
SELECT doc_id, tokens, cum_before,
       CAST(floor(cum_before / {_PACK_CAP}) AS BIGINT) AS seq_id,
       CAST(cum_before % {_PACK_CAP} AS BIGINT) AS seq_offset,
       floor(cum_before / {_PACK_CAP})
         <> floor((cum_before + tokens - 1) / {_PACK_CAP}) AS straddles
FROM p ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Z-order layout key: interleave the low bits of two scan dimensions so ONE
# sort gives locality on BOTH (the Delta/Iceberg OPTIMIZE ZORDER move) —
# files then carry tight min/max ranges on either column and scans with a
# predicate on just one of them still prune. The z-value is a pure bitwise
# projection (whole-stage codegen, no shuffle); the demonstration groups by
# coarse z-bucket and shows both dimensions are range-bounded per bucket.
# --------------------------------------------------------------------------
_Z_BITS = 10  # per dimension -> 20-bit z-value


def _interleave(xe: str, ye: str) -> str:
    """Bit-interleave SQL, valid in both engines: x gets even bit lanes,
    y odd. & / << / >> and the CASE parse identically in Spark and DuckDB.
    """
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({xe} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ye} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    z = _interleave(
        f"(l_partkey % {1 << _Z_BITS})", f"(l_suppkey % {1 << _Z_BITS})"
    )
    return (
        li.withColumn("zbucket", F.expr(f"({z}) >> 14"))
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("min_part"),
            F.max("l_partkey").alias("max_part"),
            F.min("l_suppkey").alias("min_supp"),
            F.max("l_suppkey").alias("max_supp"),
            dsum("l_quantity", "sum_qty"),
        )
        .orderBy("zbucket")
    )


_ZORDER_SQL = f"""
SELECT (({_interleave(f'(l_partkey % {1 << _Z_BITS})',
                      f'(l_suppkey % {1 << _Z_BITS})')}) >> 14) AS zbucket,
       COUNT(*) AS n_rows,
       MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
       MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp,
       CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# Context-window chunking: split each document's token stream into
# fixed-width windows with a stride (overlap = window − stride), the
# standard pre-tokenization step for long documents. Chunk starts are
# 1 + i·stride for i in 0..ceil(max(0, n−W)/stride); the last chunk may be
# short. Pure projection + explode — no shuffle at any corpus size; rows
# amplify by ≈ n/stride, bounded and predictable. All arithmetic is
# integer (ceil(a/b) = (a+b-1) div b), so both engines agree exactly.
# --------------------------------------------------------------------------
_CHUNK_W = 32
_CHUNK_STRIDE = 24


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    ).select("doc_id", F.split(F.col("text"), " ").alias("t"))
    W, S = _CHUNK_W, _CHUNK_STRIDE
    chunks = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, (greatest(size(t) - {W}, 0) + {S} - 1) div {S}), "
                f"i -> named_struct('chunk_idx', i, "
                f"'chunk', slice(t, i * {S} + 1, {W})))"
            )
        ).alias("c"),
    )
    return chunks.select(
        "doc_id",
        F.col("c.chunk_idx").cast("int").alias("chunk_idx"),
        F.size("c.chunk").cast("int").alias("n_tokens"),
        F.array_join("c.chunk", " ").alias("chunk_text"),
    ).orderBy("doc_id", "chunk_idx")


_CHUNK_SQL = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
           WHERE doc_id < 200),
c AS (SELECT doc_id, t,
             unnest(generate_series(
                 0, (greatest(len(t) - {_CHUNK_W}, 0) + {_CHUNK_STRIDE} - 1)
                    // {_CHUNK_STRIDE})) AS chunk_idx
      FROM d)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(len(list_slice(t, chunk_idx * {_CHUNK_STRIDE} + 1,
                           chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_W})) AS INT)
           AS n_tokens,
       array_to_string(list_slice(t, chunk_idx * {_CHUNK_STRIDE} + 1,
                                  chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_W}), ' ')
           AS chunk_text
FROM c ORDER BY doc_id, chunk_idx
"""


# --------------------------------------------------------------------------
# Token-budget mix materialization — STAGED for r14 registration: turn a
# per-source TOKEN budget into an actual document selection (the step
# after domain_mix/mix_temperature decide the weights: fill each source's
# quota and stop). Documents are ordered by portable md5 hash within
# their source (deterministic shuffle — budget filling must not correlate
# with doc_id order), and a document is admitted iff its source's budget
# is not yet exhausted before it (the last admitted document may straddle
# the boundary; `fits` marks the ones fully inside). The running sum is
# operators/ranking.with_grouped_cumsum — ONE global range shuffle + a
# |sources|-row offsets broadcast, NO per-source window task: sources are
# few and huge at 100 TB, exactly the skew case Window.partitionBy(source)
# collapses on.
# --------------------------------------------------------------------------
_MIX_BUDGET = 800  # tokens per source


def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineer_development_spark.operators.ranking import (
        with_grouped_cumsum,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("tokens"),
        F.expr(spark_md5_int("cast(doc_id as string)")).alias("h"),
    )
    cum = with_grouped_cumsum(
        docs, "tokens", ["source"], "h", "doc_id", cum_col="cum_src"
    )
    return (
        cum.filter(F.col("cum_src") < _MIX_BUDGET)
        .select(
            "doc_id",
            "source",
            "tokens",
            "cum_src",
            ((F.col("cum_src") + F.col("tokens")) <= _MIX_BUDGET).alias(
                "fits"
            ),
        )
        .orderBy("doc_id")
    )


_TOKEN_BUDGET_SQL = f"""
WITH d AS (SELECT doc_id, source,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
                  {duck_md5_int('CAST(doc_id AS VARCHAR)')} AS h
           FROM documents),
c AS (SELECT *, CAST(COALESCE(SUM(tokens) OVER (
              PARTITION BY source ORDER BY h, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS cum_src
      FROM d)
SELECT doc_id, source, tokens, cum_src,
       cum_src + tokens <= {_MIX_BUDGET} AS fits
FROM c WHERE cum_src < {_MIX_BUDGET} ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Length-bucketed inference batches — STAGED for r14+ registration: the
# batched-inference scheduler's plan. Padding every batch to its longest
# member wastes compute proportional to length variance, so production
# scoring/embedding jobs bucket documents by padded length first. Here:
# pad-to = token count rounded up to a multiple of 16 (integer ceil — no
# log2 float), documents md5-shuffled within their bucket (batch content
# must not correlate with doc_id order), fixed _BATCH_ROWS rows per batch,
# and per batch BOTH waste accountings a capacity planner reads: vs the
# bucket's pad-to and vs the batch's actual max (the tight lower bound).
# All integer; one row per (bucket, batch).
#
# Scale shape: the within-bucket rank is operators/ranking.
# with_grouped_cumsum (weight 1 ⇒ exclusive rank) — buckets are FEW and
# HUGE (a handful of pad sizes over a whole corpus), exactly the case
# where Window.partitionBy(bucket) would collapse each bucket into one
# task's sort; here it is one global range shuffle + a |buckets|-row
# offsets broadcast. The final agg keys on (bucket, batch_idx) — fixed
# fan-in _BATCH_ROWS, map-side combinable, unskewable by construction.
# --------------------------------------------------------------------------
_LB_PAD = 16     # pad-to granularity (tokens)
_LB_ROWS = 8     # rows per inference batch


def q_length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineer_development_spark.operators.ranking import (
        with_grouped_cumsum,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("tokens"),
        F.expr(spark_md5_int("cast(doc_id as string)")).alias("h"),
    ).withColumn(
        "pad_to",
        F.expr(f"((tokens + {_LB_PAD - 1}) div {_LB_PAD}) * {_LB_PAD}"),
    )
    ranked = with_grouped_cumsum(
        docs.withColumn("one", F.lit(1).cast("long")),
        "one",
        ["pad_to"],
        "h",
        "doc_id",
        cum_col="rk",
    )
    return (
        ranked.withColumn("batch_idx", F.expr(f"rk div {_LB_ROWS}"))
        .groupBy("pad_to", "batch_idx")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("tokens").alias("sum_tokens"),
            F.max("tokens").alias("max_tokens"),
        )
        .select(
            F.col("pad_to").cast("long").alias("pad_to"),
            F.col("batch_idx").cast("long").alias("batch_idx"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("sum_tokens").cast("long").alias("sum_tokens"),
            (F.col("n_rows") * F.col("pad_to") - F.col("sum_tokens"))
            .cast("long")
            .alias("waste_bucket"),
            (F.col("n_rows") * F.col("max_tokens") - F.col("sum_tokens"))
            .cast("long")
            .alias("waste_tight"),
        )
        .orderBy("pad_to", "batch_idx")
    )


_LENGTH_BUCKET_SQL = f"""
WITH d AS (SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
                  {duck_md5_int('CAST(doc_id AS VARCHAR)')} AS h
           FROM documents),
p AS (SELECT *, ((tokens + {_LB_PAD - 1}) // {_LB_PAD}) * {_LB_PAD}
                    AS pad_to
      FROM d),
r AS (SELECT *, (ROW_NUMBER() OVER (PARTITION BY pad_to
                                    ORDER BY h, doc_id) - 1)
                    // {_LB_ROWS} AS batch_idx
      FROM p)
SELECT CAST(pad_to AS BIGINT) AS pad_to,
       CAST(batch_idx AS BIGINT) AS batch_idx,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(tokens) AS BIGINT) AS sum_tokens,
       CAST(COUNT(*) * pad_to - SUM(tokens) AS BIGINT) AS waste_bucket,
       CAST(COUNT(*) * MAX(tokens) - SUM(tokens) AS BIGINT) AS waste_tight
FROM r GROUP BY pad_to, batch_idx ORDER BY pad_to, batch_idx
"""


QUERIES = {
    "domain_mix": q_domain_mix,
    "pack_sequences": q_pack_sequences,
    "pack_sequences_global": q_pack_sequences_global,
    "chunk_documents": q_chunk_documents,
    "zorder_layout": q_zorder_layout,
    # registered r14 (staged r13, tri-SF + ANSI-on parity on record)
    "token_budget_mix": q_token_budget_mix,
    "length_bucket_batches": q_length_bucket_batches,
}

ORACLE = {
    "token_budget_mix": _TOKEN_BUDGET_SQL,
    "length_bucket_batches": _LENGTH_BUCKET_SQL,
    "domain_mix": _DOMAIN_MIX_SQL,
    "pack_sequences": _PACK_SQL,
    "pack_sequences_global": _PACK_GLOBAL_SQL,
    "chunk_documents": _CHUNK_SQL,
    "zorder_layout": _ZORDER_SQL,
}
