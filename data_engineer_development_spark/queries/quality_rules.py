"""Corpus quality-rule operators (north-star LLM-pipeline extension).

Three operators a training-data pipeline runs over every document before
mixing a corpus:

- ``quality_gopher_rules`` — Gopher-style heuristic keep/drop rules
  (token-count bounds, mean-token-length band, stopword evidence,
  alphabetic-token ratio), each emitted as its own flag so downstream
  audits can see WHICH rule dropped a document, plus the conjunctive keep.
- ``text_diversity`` — Simpson diversity (collision probability) of the
  unigram distribution: 1 - Σ cᵢ²/n². A near-duplicate-of-itself document
  (repetition loop) scores low; natural text scores high. Computed from
  INTEGER count sums only (Σcᵢ² is exact), so the value is bit-identical
  across engines — unlike Shannon entropy, whose ln() is libm-specific.
- ``mix_temperature`` — temperature-scaled source weights (α = 0.5, i.e.
  weight ∝ √tokens): the standard flattening of a source-size distribution
  before sampling a training mix. √ is IEEE-correctly-rounded (unlike
  pow), and the per-source weights are summed as decimals so the
  normalizing constant is order-independent.

Scale: all three are one scan + one or two low-cardinality shuffles.
``text_diversity`` is explode → (doc,token) count → per-doc sum: the
token-level aggregate map-side combines, and nothing is ever collected.
At 100 TB the (doc,token) shuffle is the cost of any unigram statistic;
hot tokens don't skew it because doc_id is in the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineer_development_spark.operators import text as T
from data_engineer_development_spark.sources import load_table


def _duck_stop_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in T.STOPWORDS[lang]) + "]"


# --------------------------------------------------------------------------
# Gopher-style quality rules. Thresholds are tuned so the synthetic corpus
# exercises both branches of each rule; the rule SET (not the constants) is
# the operator. Ratios are single double divisions of exact integers —
# deterministic in both engines.
# --------------------------------------------------------------------------
_MIN_TOKENS, _MAX_TOKENS = 20, 100_000
_MIN_MEAN_LEN, _MAX_MEAN_LEN = 2.0, 12.0
_MIN_STOP_HITS = 2
_MIN_ALPHA_RATIO = 0.8


def q_quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("t", T.tokens())
    n = F.size("t")
    mean_len = T.char_sum("t").cast("double") / n
    stop_hits = T.stopword_count("t", "en")
    alpha = F.size(F.filter(F.col("t"), lambda x: x.rlike("^[a-z]+$")))
    alpha_ratio = alpha.cast("double") / n
    rule_len = (n >= _MIN_TOKENS) & (n <= _MAX_TOKENS)
    rule_mean = (mean_len >= _MIN_MEAN_LEN) & (mean_len <= _MAX_MEAN_LEN)
    rule_stop = stop_hits >= _MIN_STOP_HITS
    rule_alpha = alpha_ratio >= _MIN_ALPHA_RATIO
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        stop_hits.alias("stop_hits"),
        alpha_ratio.alias("alpha_ratio"),
        rule_len.alias("pass_len"),
        rule_mean.alias("pass_mean_len"),
        rule_stop.alias("pass_stopwords"),
        rule_alpha.alias("pass_alpha"),
        (rule_len & rule_mean & rule_stop & rule_alpha).alias("keep"),
    ).orderBy("doc_id")


_GOPHER_RULES_SQL = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
f AS (SELECT doc_id,
             len(t) AS n_tokens,
             CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
               / len(t) AS mean_token_len,
             len(list_filter(t, x -> list_contains({_duck_stop_list('en')}, x)))
               AS stop_hits,
             CAST(len(list_filter(t, x -> regexp_full_match(x, '[a-z]+')))
                  AS DOUBLE) / len(t) AS alpha_ratio
      FROM d)
SELECT doc_id, n_tokens, mean_token_len, stop_hits, alpha_ratio,
       n_tokens >= {_MIN_TOKENS} AND n_tokens <= {_MAX_TOKENS} AS pass_len,
       mean_token_len >= {_MIN_MEAN_LEN} AND mean_token_len <= {_MAX_MEAN_LEN}
         AS pass_mean_len,
       stop_hits >= {_MIN_STOP_HITS} AS pass_stopwords,
       alpha_ratio >= {_MIN_ALPHA_RATIO} AS pass_alpha,
       (n_tokens >= {_MIN_TOKENS} AND n_tokens <= {_MAX_TOKENS})
         AND (mean_token_len >= {_MIN_MEAN_LEN}
              AND mean_token_len <= {_MAX_MEAN_LEN})
         AND stop_hits >= {_MIN_STOP_HITS}
         AND alpha_ratio >= {_MIN_ALPHA_RATIO} AS keep
FROM f ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Simpson diversity of the per-document unigram distribution.
# --------------------------------------------------------------------------
def q_text_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("t", T.tokens())
    counts = (
        docs.select("doc_id", F.explode("t").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    n2 = F.col("n").cast("double") * F.col("n").cast("double")
    return agg.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        "n_distinct",
        (F.lit(1.0) - F.col("ss").cast("double") / n2).alias("simpson"),
        (n2 / F.col("ss").cast("double")).alias("effective_vocab"),
    ).orderBy("doc_id")


_TEXT_DIVERSITY_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
c AS (SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY 1, 2),
a AS (SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(c * c) AS BIGINT) AS ss,
             COUNT(*) AS n_distinct
      FROM c GROUP BY 1)
SELECT doc_id, n AS n_tokens, n_distinct,
       1.0 - CAST(ss AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
         AS simpson,
       (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / CAST(ss AS DOUBLE)
         AS effective_vocab
FROM a ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Temperature-scaled source mixing (α = 0.5). The √token-mass weights are
# cast to DECIMAL(20,6) BEFORE the normalizing sum so the total is exact
# and order-independent; each share then divides two deterministic doubles.
# target_docs budgets a 10k-document mix.
# --------------------------------------------------------------------------
_MIX_BUDGET = 10_000


def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("t", T.tokens())
    per_src = docs.groupBy("source").agg(
        F.sum(F.size("t")).alias("total_tokens")
    )
    w = F.sqrt(F.col("total_tokens").cast("double")).cast("decimal(20,6)")
    weighted = per_src.withColumn("w", w)
    share = F.col("w").cast("double") / F.sum("w").over(
        Window.partitionBy()
    ).cast("double")
    return (
        weighted.select(
            "source",
            "total_tokens",
            share.alias("mix_share"),
            F.floor(share * _MIX_BUDGET).cast("bigint").alias("target_docs"),
        )
        .orderBy("source")
    )


_MIX_TEMPERATURE_SQL = f"""
WITH s AS (
  SELECT source,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
  FROM documents GROUP BY source),
w AS (SELECT source, total_tokens,
             CAST(sqrt(CAST(total_tokens AS DOUBLE)) AS DECIMAL(20,6)) AS w
      FROM s)
SELECT source, total_tokens,
       CAST(w AS DOUBLE) / CAST(SUM(w) OVER () AS DOUBLE) AS mix_share,
       CAST(FLOOR(CAST(w AS DOUBLE) / CAST(SUM(w) OVER () AS DOUBLE)
                  * {_MIX_BUDGET}) AS BIGINT) AS target_docs
FROM w ORDER BY source
"""


# --------------------------------------------------------------------------
# Intra-document n-gram repetition — ROUND-13+ REGISTRATION CANDIDATE
# (staged): the Gopher-family repetition filters (Rae et al. 2021, public
# paper) adapted to the fixture's single-line documents — the signal that
# catches a document stuck in a generation/boilerplate loop, which the
# length/stopword rules above can't see. Per document (n_tokens ≥ 3):
#
# - top2_frac: occurrences of the MOST-COMMON token 2-gram over all 2-gram
#   positions (n_tokens − 1); tie-break (count DESC, gram ASC) so both
#   engines pick the same gram.
# - dup3_frac: fraction of 3-gram positions whose 3-gram occurs ≥ 2 times
#   in the document (Σ counts over repeated grams / (n_tokens − 2)).
# - keep_repetition: both fractions under their thresholds (constants
#   chosen so the fixture exercises both branches).
#
# All counts are exact integers; each fraction is ONE IEEE division of
# exact ints, and the keep comparison runs on bit-identical doubles, so
# the whole row hashes exactly across engines. Scale: two shuffles keyed
# (doc_id, gram) — map-side combinable, doc_id in the key kills hot-gram
# skew; nothing collects.
# --------------------------------------------------------------------------
_TOP2_MAX = 0.12
_DUP3_MAX = 0.10


def q_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .withColumn("t", T.tokens())
        .filter(F.size("t") >= 3)
        .select("doc_id", "t", F.size("t").alias("n_tokens"))
    )
    g2 = docs.select(
        "doc_id",
        "n_tokens",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), i -> "
                "concat(element_at(t, i), ' ', element_at(t, i + 1)))"
            )
        ).alias("g"),
    )
    c2 = g2.groupBy("doc_id", "n_tokens", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("g"))
    t2 = (
        c2.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            "n_tokens",
            F.col("g").alias("top2_gram"),
            F.col("c").cast("long").alias("top2_count"),
        )
    )
    g3 = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 2), i -> "
                "concat(element_at(t, i), ' ', element_at(t, i + 1), "
                "' ', element_at(t, i + 2)))"
            )
        ).alias("g"),
    )
    d3 = (
        g3.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("c") >= 2, F.col("c"))), F.lit(0)
            ).cast("long").alias("dup3")
        )
    )
    top2_frac = F.col("top2_count").cast("double") / (F.col("n_tokens") - 1)
    dup3_frac = F.col("dup3").cast("double") / (F.col("n_tokens") - 2)
    return (
        t2.join(d3, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "top2_gram",
            "top2_count",
            top2_frac.alias("top2_frac"),
            dup3_frac.alias("dup3_frac"),
            (
                (top2_frac <= F.lit(_TOP2_MAX))
                & (dup3_frac <= F.lit(_DUP3_MAX))
            ).alias("keep_repetition"),
        )
        .orderBy("doc_id")
    )


_QUALITY_REPETITION_SQL = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
           WHERE len(string_split(text, ' ')) >= 3),
b AS (SELECT doc_id, len(t) AS n_tokens,
             list_transform(generate_series(1, len(t) - 1),
                            i -> t[i] || ' ' || t[i + 1]) AS g2,
             list_transform(generate_series(1, len(t) - 2),
                            i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])
               AS g3
      FROM d),
c2 AS (SELECT doc_id, n_tokens, g, COUNT(*) AS c
       FROM (SELECT doc_id, n_tokens, unnest(g2) AS g FROM b)
       GROUP BY doc_id, n_tokens, g),
t2 AS (SELECT doc_id, n_tokens, g AS top2_gram,
              CAST(c AS BIGINT) AS top2_count
       FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                          ORDER BY c DESC, g) AS rk
             FROM c2) WHERE rk = 1),
d3 AS (SELECT doc_id,
              CAST(COALESCE(SUM(CASE WHEN c >= 2 THEN c END), 0) AS BIGINT)
                AS dup3
       FROM (SELECT doc_id, g, COUNT(*) AS c
             FROM (SELECT doc_id, unnest(g3) AS g FROM b)
             GROUP BY doc_id, g)
       GROUP BY doc_id)
SELECT t2.doc_id, t2.n_tokens, t2.top2_gram, t2.top2_count,
       CAST(t2.top2_count AS DOUBLE) / (t2.n_tokens - 1) AS top2_frac,
       CAST(d3.dup3 AS DOUBLE) / (t2.n_tokens - 2) AS dup3_frac,
       CAST(t2.top2_count AS DOUBLE) / (t2.n_tokens - 1) <= {_TOP2_MAX}
         AND CAST(d3.dup3 AS DOUBLE) / (t2.n_tokens - 2) <= {_DUP3_MAX}
         AS keep_repetition
FROM t2 JOIN d3 ON t2.doc_id = d3.doc_id
ORDER BY t2.doc_id
"""


QUERIES = {
    "quality_gopher_rules": q_quality_gopher_rules,
    "quality_repetition": q_quality_repetition,
    "text_diversity": q_text_diversity,
    "mix_temperature": q_mix_temperature,
}

ORACLE = {
    "quality_gopher_rules": _GOPHER_RULES_SQL,
    "quality_repetition": _QUALITY_REPETITION_SQL,
    "text_diversity": _TEXT_DIVERSITY_SQL,
    "mix_temperature": _MIX_TEMPERATURE_SQL,
}
