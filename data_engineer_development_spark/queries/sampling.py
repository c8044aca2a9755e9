"""Deterministic sampling operators for training-data pipelines
(north-star extension — alongside dedup/similarity/text in SURVEY.md §7.2
item 5).

Real corpus pipelines never use ``rand()`` sampling: reruns must select
the SAME documents (caching, incremental builds, auditability), so the
sample predicate is a hash of the stable key. Both entries use the
cross-engine md5 hash (functions/portable_hash.py) so the DuckDB oracle
selects the identical rows.

Scale notes: hash sampling is a pure scan-side filter (no shuffle, prunes
at the scan when combined with partition columns); stratified top-n is one
window per stratum — a single hash-partitioned shuffle on the stratum key,
independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineer_development_spark.functions.portable_hash import (
    duck_md5_int,
    spark_md5_int,
)
from data_engineer_development_spark.sources import load_table

_SAMPLE_PCT = 10  # keep ~10% of documents


def q_sample_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% document sample: md5(doc_id) % 100 < 10."""
    docs = load_table(spark, sf_dir, "documents")
    h = spark_md5_int("cast(doc_id as string)")
    return (
        docs.filter(F.expr(f"{h} % 100 < {_SAMPLE_PCT}"))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


_SAMPLE_HASH_SQL = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {duck_md5_int('CAST(doc_id AS VARCHAR)')} % 100 < {_SAMPLE_PCT}
ORDER BY doc_id
"""


_STRATA_N = 5  # docs kept per (lang, source) stratum


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced per-stratum sample: top-N docs per (lang, source) ranked by
    the portable hash — every stratum contributes equally regardless of its
    population (the class-balance shape for training mixes)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(spark_md5_int("cast(doc_id as string)"))
    w = Window.partitionBy("lang", "source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _STRATA_N)
        .select("lang", "source", F.col("rk").alias("rk"), "doc_id")
        .orderBy("lang", "source", "rk")
    )


_STRATIFIED_SQL = f"""
SELECT lang, source, CAST(rk AS INT) AS rk, doc_id
FROM (SELECT lang, source, doc_id,
             row_number() OVER (PARTITION BY lang, source
                 ORDER BY {duck_md5_int('CAST(doc_id AS VARCHAR)')}, doc_id) AS rk
      FROM documents)
WHERE rk <= {_STRATA_N}
ORDER BY lang, source, rk
"""


def q_text_top_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signal: most-frequent-token share per document (a high
    ratio flags boilerplate/spam for quality filtering). Distributed shape:
    explode → two keyed aggregations — scales as tokens, never as doc², and
    the (doc_id, tok) partial aggregate collapses map-side."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    per_tok = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("n"))
    per_doc = per_tok.groupBy("doc_id").agg(
        F.max("n").alias("max_tok_n"), F.sum("n").alias("n_tokens")
    )
    return per_doc.select(
        "doc_id",
        "max_tok_n",
        "n_tokens",
        (F.col("max_tok_n").cast("double") / F.col("n_tokens")).alias(
            "top_token_ratio"
        ),
    ).orderBy("doc_id")


_TOP_TOKEN_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
per_tok AS (SELECT doc_id, tok, COUNT(*) AS n FROM tok GROUP BY doc_id, tok),
per_doc AS (SELECT doc_id, MAX(n) AS max_tok_n, SUM(n) AS n_tokens
            FROM per_tok GROUP BY doc_id)
SELECT doc_id, max_tok_n, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(max_tok_n AS DOUBLE) / n_tokens AS top_token_ratio
FROM per_doc ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Per-domain frequency cap — STAGED for r14+ registration: the C4/
# RefinedWeb curation rule "no domain may contribute more than CAP
# documents". Unlike stratified_sample (keep top-N per stratum, a
# BALANCING device) this is a CEILING: small sources pass through whole,
# over-represented ones are truncated at CAP in deterministic md5 order —
# and the output keeps EVERY document with its within-source rank and a
# kept flag, so the dropped set is auditable (curation decisions must be
# reviewable, not silently applied). All integer.
#
# Scale shape: the within-source rank is operators/ranking.
# with_grouped_cumsum weight-1 — sources are FEW and HUGE at corpus
# scale, exactly where Window.partitionBy(source) collapses into
# one-task-per-source sorts; here it is one global range shuffle + a
# |sources|-row offsets broadcast. No other shuffle.
# --------------------------------------------------------------------------
_DOMAIN_CAP = 15  # max docs per source


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineer_development_spark.operators.ranking import (
        with_grouped_cumsum,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr(spark_md5_int("cast(doc_id as string)")).alias("h"),
        F.lit(1).cast("long").alias("one"),
    )
    ranked = with_grouped_cumsum(
        docs, "one", ["source"], "h", "doc_id", cum_col="rk"
    )
    return ranked.select(
        "doc_id",
        "source",
        F.col("rk").cast("long").alias("rk"),
        (F.col("rk") < _DOMAIN_CAP).alias("kept"),
    ).orderBy("doc_id")


_DOMAIN_CAP_SQL = f"""
SELECT doc_id, source, CAST(rk AS BIGINT) AS rk, rk < {_DOMAIN_CAP} AS kept
FROM (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                 ORDER BY {duck_md5_int('CAST(doc_id AS VARCHAR)')}, doc_id)
               - 1 AS rk
      FROM documents)
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Streaming per-domain admission gate — STAGED for r14+ registration: the
# domain_cap rule at INGEST time (streaming/stateful.py
# stream_domain_cap_gate): admit first-come per source until the cap,
# O(1) keyed state per source. Deliberately different selection than the
# batch entry — md5 order is a reproducible SAMPLE (batch can see the
# whole source); arrival order is the only honest online policy. The
# single-data-batch run (asserted) makes the in-batch doc_id sort equal
# the batch ROW_NUMBER dual exactly, the same discipline as
# stream_neardup_gate; cross-batch state transitions are pinned by a
# direct kernel test with a fake GroupState.
# --------------------------------------------------------------------------
def q_stream_domain_cap_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid as _uuid

    from data_engineer_development_spark.streaming.stateful import (
        stream_domain_cap_gate,
    )
    from data_engineer_development_spark.streaming.windows import (
        run_to_memory_sink,
        stream_table,
    )

    gated = stream_domain_cap_gate(
        stream_table(spark, sf_dir, "documents"), cap=_DOMAIN_CAP
    )
    name = f"q_domcap_{_uuid.uuid4().hex[:8]}"
    run_to_memory_sink(
        gated, name, output_mode="update", assert_single_batch=True,
        state_partitions=4, no_data_batches=False,
    )
    return spark.table(name).orderBy("doc_id")


_STREAM_DOMAIN_CAP_SQL = f"""
SELECT doc_id, source, CAST(rn - 1 AS BIGINT) AS rk,
       CAST(CASE WHEN rn - 1 < {_DOMAIN_CAP} THEN 1 ELSE 0 END AS INT)
           AS admitted
FROM (SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents)
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# K-fold split balance audit — STAGED for r15 registration: the
# cross-validation companion to split_leakage_audit (which audits
# LEAKAGE of a 2-way split; this audits BALANCE of a K-way one). Folds
# are the deterministic portable-hash assignment md5(doc_id) % K —
# reproducible on any engine, no RNG state to ship — and the output is
# each (fold, lang) cell's document/char mass plus its per-mille share
# of the language (integer div) and the deviation from the ideal
# 1000/K. A skewed cell here means per-fold eval metrics aren't
# comparable — the thing to read BEFORE trusting k-fold numbers. One
# (fold, lang) shuffle + one (lang) shuffle, both map-side combinable;
# the |langs|-row totals broadcast.
# --------------------------------------------------------------------------
_KFOLD_K = 5


def q_kfold_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = spark_md5_int("cast(doc_id as string)")
    d = docs.select(
        F.expr(f"{h} % {_KFOLD_K}").alias("fold"), "lang", "n_chars"
    )
    per = d.groupBy("fold", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    tot = d.groupBy("lang").agg(F.count(F.lit(1)).alias("lang_total"))
    ideal = 1000 // _KFOLD_K
    return (
        per.join(F.broadcast(tot), "lang")
        .select(
            "fold",
            "lang",
            "n_docs",
            "n_chars",
            F.expr("n_docs * 1000 div lang_total").alias("share_milli"),
            F.expr(
                f"abs(n_docs * 1000 div lang_total - {ideal})"
            ).alias("dev_milli"),
        )
        .orderBy("fold", "lang")
    )


_KFOLD_SQL = f"""
WITH d AS (SELECT {duck_md5_int('CAST(doc_id AS VARCHAR)')} % {_KFOLD_K}
                  AS fold, lang, n_chars
           FROM documents),
per AS (SELECT fold, lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM d GROUP BY fold, lang),
tot AS (SELECT lang, COUNT(*) AS lang_total FROM d GROUP BY lang)
SELECT per.fold, per.lang, per.n_docs, per.n_chars,
       per.n_docs * 1000 // tot.lang_total AS share_milli,
       ABS(per.n_docs * 1000 // tot.lang_total - {1000 // _KFOLD_K})
         AS dev_milli
FROM per JOIN tot USING (lang) ORDER BY per.fold, per.lang
"""


QUERIES = {
    "sample_hash_bucket": q_sample_hash_bucket,
    "stratified_sample": q_stratified_sample,
    "text_top_token_ratio": q_text_top_token_ratio,
    # registered r14 (staged r13, tri-SF + ANSI-on parity on record)
    "domain_cap": q_domain_cap,
    "stream_domain_cap_gate": q_stream_domain_cap_gate,
    # registered r15 (staged r14, tri-SF + ANSI-on parity on record)
    "kfold_balance": q_kfold_balance,
}

ORACLE = {
    "kfold_balance": _KFOLD_SQL,
    "domain_cap": _DOMAIN_CAP_SQL,
    "stream_domain_cap_gate": _STREAM_DOMAIN_CAP_SQL,
    "sample_hash_bucket": _SAMPLE_HASH_SQL,
    "stratified_sample": _STRATIFIED_SQL,
    "text_top_token_ratio": _TOP_TOKEN_SQL,
}
