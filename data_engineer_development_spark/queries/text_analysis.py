"""Text-analysis queries over the documents table (north-star extension).

Operators live in operators/text.py (pure column expressions); the DuckDB
oracle SQL below is generated from the SAME constants (stopword lists, md5
hash construction, modulus) so the correctness gate covers the heuristics'
math end-to-end, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineer_development_spark.functions.portable_hash import P, duck_md5_int
from data_engineer_development_spark.operators import text as T
from data_engineer_development_spark.sources import load_table


def _duck_stop_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in T.STOPWORDS[lang]) + "]"


# --------------------------------------------------------------------------
# Token statistics: counts, distinct counts, mean token length.
# --------------------------------------------------------------------------
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("t", T.tokens())
    return docs.select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        F.size(F.array_distinct("t")).alias("n_distinct"),
        (T.char_sum("t").cast("double") / F.size("t")).alias("mean_token_len"),
    ).orderBy("doc_id")


_TEXT_TOKEN_STATS_SQL = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
SELECT doc_id,
       len(t) AS n_tokens,
       len(list_distinct(t)) AS n_distinct,
       CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) AS mean_token_len
FROM d ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Language ID (stopword vote, deterministic tie-break).
# --------------------------------------------------------------------------
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("t", T.tokens())
    return docs.select(
        "doc_id",
        "lang",
        T.lang_id("t").alias("lang_pred"),
        T.stopword_count("t", "en").alias("en_votes"),
    ).orderBy("doc_id")


def _lang_id_sql() -> str:
    scores = {
        lang: f"len(list_filter(t, x -> list_contains({_duck_stop_list(lang)}, x)))"
        for lang in T.STOPWORDS
    }
    mx = "greatest(" + ", ".join(scores.values()) + ")"
    arms = " ".join(
        f"WHEN {scores[lang]} = {mx} THEN '{lang}'" for lang in T.STOPWORDS
    )
    return f"""
WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents)
SELECT doc_id, lang,
       CASE WHEN {mx} = 0 THEN 'und' {arms} END AS lang_pred,
       {scores['en']} AS en_votes
FROM d ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Quality score (length / repetition / naturalness mix).
# --------------------------------------------------------------------------
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("t", T.tokens())
    return docs.select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        T.quality_score("t").alias("quality"),
    ).orderBy("doc_id")


_TEXT_QUALITY_SQL = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
SELECT doc_id,
       len(t) AS n_tokens,
       (0.4 * least(CAST(len(t) AS DOUBLE) / 100.0, 1.0)
        + 0.4 * (CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)))
       + 0.2 * least(5.0 * (CAST(len(list_filter(t, x -> list_contains({_duck_stop_list('en')}, x))) AS DOUBLE)
                            / CAST(len(t) AS DOUBLE)), 1.0) AS quality
FROM d ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Rolling-hash document fingerprint (order-sensitive).
# --------------------------------------------------------------------------
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("t", T.tokens())
    return docs.select(
        "doc_id", T.fingerprint("t").alias("fingerprint")
    ).orderBy("doc_id")


_TEXT_FINGERPRINT_SQL = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(t, x -> {duck_md5_int('x')} % {P})),
         (a, b) -> (a * 31 + b) % {P}) AS fingerprint
FROM d ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Repetition signal (the Gopher-rules "fraction of characters in the most
# common n-gram" family): top-bigram share per document. High values mark
# boilerplate/spam for corpus filtering. Shape at 100 TB: bigram explode is
# a narrow flatMap; the (doc, bigram) count partially aggregates map-side
# before its one shuffle keyed by doc — no global dictionary, no skew (a
# doc's bigrams are bounded by its length). The ratio divides two exact
# int64 counts in IEEE double; no string "winner" column so bigram-count
# ties can't break determinism.
# --------------------------------------------------------------------------
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    )
    bg = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1)))"
            )
        ).alias("bg"),
    )
    counts = bg.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.max("n").alias("top_bigram_n"),
            F.sum("n").alias("n_bigrams"),
        )
        .select(
            "doc_id",
            "top_bigram_n",
            "n_bigrams",
            (
                F.col("top_bigram_n").cast("double")
                / F.col("n_bigrams").cast("double")
            ).alias("rep_ratio"),
        )
        .orderBy("doc_id")
    )


_TEXT_REPETITION_SQL = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bg AS (SELECT doc_id,
              unnest(list_transform(generate_series(1, len(t) - 1),
                     i -> concat_ws(' ', t[i], t[i+1]))) AS bg
       FROM d),
c AS (SELECT doc_id, bg, COUNT(*) AS n FROM bg GROUP BY 1, 2)
SELECT doc_id, CAST(MAX(n) AS BIGINT) AS top_bigram_n,
       CAST(SUM(n) AS BIGINT) AS n_bigrams,
       CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS rep_ratio
FROM c GROUP BY doc_id ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Normalization: the canonical pre-dedup cleanup (lowercase → strip
# non-alphanumerics → collapse whitespace runs → trim). Three JVM regexp
# passes at scan speed, no shuffle; DuckDB's regexp_replace with the 'g'
# flag is the exact dual (ASCII lower() agrees in both engines).
# --------------------------------------------------------------------------
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        F.length("text").cast("int").alias("n_chars_raw"),
        norm.alias("norm_text"),
        F.length(norm).cast("int").alias("n_chars_norm"),
    ).orderBy("doc_id")


_TEXT_NORMALIZE_SQL = """
SELECT doc_id,
       CAST(length(text) AS INT) AS n_chars_raw,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                           ' +', ' ', 'g')) AS norm_text,
       CAST(length(trim(regexp_replace(
            regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
            ' +', ' ', 'g'))) AS INT) AS n_chars_norm
FROM documents ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Corpus-familiarity score: per-document mean token DOCUMENT frequency — a
# perplexity proxy without transcendental math. Docs dominated by rare
# tokens (low mean_df) are out-of-distribution/noise candidates; docs of
# only ubiquitous tokens (high mean_df) are boilerplate candidates. All
# integer arithmetic until one final int/int double division, so the Spark
# and DuckDB values are bit-identical (no log/float accumulation). Shape is
# the postings pattern: explode distinct tokens, count docs per token, join
# back, aggregate — two hash shuffles on bounded keys, scales like TF-IDF.
# --------------------------------------------------------------------------
def q_text_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("t", T.tokens())
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct("t")).alias("tok")
    )
    dfc = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return (
        toks.join(dfc, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum("df").alias("sum_df"),
        )
        .select(
            "doc_id",
            "n_distinct",
            F.col("sum_df").cast("long").alias("sum_df"),
            (F.col("sum_df").cast("double") / F.col("n_distinct")).alias(
                "mean_df"
            ),
        )
        .orderBy("doc_id")
    )


_TEXT_FAMILIARITY_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
),
dfc AS (SELECT tok, COUNT(*) AS df FROM toks GROUP BY tok)
SELECT toks.doc_id,
       COUNT(*) AS n_distinct,
       CAST(SUM(df) AS BIGINT) AS sum_df,
       CAST(SUM(df) AS DOUBLE) / COUNT(*) AS mean_df
FROM toks JOIN dfc USING (tok)
GROUP BY toks.doc_id ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Length trimming: drop the shortest 1% and longest 1% of the corpus by
# character count — the standard outlier cut before training. The scalable
# shape: aggregate to a LENGTH HISTOGRAM first (domain = distinct lengths,
# small at any corpus size), run the cumulative window over that tiny
# table, derive the kept-length set, and semi-join the corpus on it — no
# global row-number over all documents. A length bucket is kept iff it
# intersects the middle 98% of cumulative mass; the boundary test is pure
# integer arithmetic (100*cum > N and 100*(cum-c) < 99*N), so both engines
# agree exactly — no float percentile interpolation.
# --------------------------------------------------------------------------
def q_text_length_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    hist = docs.groupBy("n_chars").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy()
    bounds = hist.select(
        "n_chars",
        "c",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(wtot).alias("n"),
    )
    kept = bounds.filter(
        (100 * F.col("cum") > F.col("n"))
        & (100 * (F.col("cum") - F.col("c")) < 99 * F.col("n"))
    ).select("n_chars")
    return (
        docs.join(F.broadcast(kept), "n_chars")
        .select("doc_id", "n_chars", "lang", "source")
        .orderBy("doc_id")
    )


_TEXT_LENGTH_TRIM_SQL = """
WITH hist AS (
  SELECT n_chars, COUNT(*) AS c FROM documents GROUP BY n_chars
),
bounds AS (
  SELECT n_chars, c,
         SUM(c) OVER (ORDER BY n_chars
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(c) OVER () AS n
  FROM hist
),
kept AS (
  SELECT n_chars FROM bounds
  WHERE 100 * cum > n AND 100 * (cum - c) < 99 * n
)
SELECT doc_id, n_chars, lang, source
FROM documents JOIN kept USING (n_chars)
ORDER BY doc_id
"""


QUERIES = {
    "text_token_stats": q_text_token_stats,
    "text_repetition": q_text_repetition,
    "text_lang_id": q_text_lang_id,
    "text_quality": q_text_quality,
    "text_fingerprint": q_text_fingerprint,
    "text_normalize": q_text_normalize,
    "text_familiarity": q_text_familiarity,
    "text_length_trim": q_text_length_trim,
}

ORACLE = {
    "text_token_stats": _TEXT_TOKEN_STATS_SQL,
    "text_repetition": _TEXT_REPETITION_SQL,
    "text_lang_id": _lang_id_sql(),
    "text_quality": _TEXT_QUALITY_SQL,
    "text_fingerprint": _TEXT_FINGERPRINT_SQL,
    "text_normalize": _TEXT_NORMALIZE_SQL,
    "text_familiarity": _TEXT_FAMILIARITY_SQL,
    "text_length_trim": _TEXT_LENGTH_TRIM_SQL,
}
