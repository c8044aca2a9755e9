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


QUERIES = {
    "quality_gopher_rules": q_quality_gopher_rules,
    "text_diversity": q_text_diversity,
    "mix_temperature": q_mix_temperature,
}

ORACLE = {
    "quality_gopher_rules": _GOPHER_RULES_SQL,
    "text_diversity": _TEXT_DIVERSITY_SQL,
    "mix_temperature": _MIX_TEMPERATURE_SQL,
}
