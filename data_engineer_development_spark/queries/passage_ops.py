"""Passage-level corpus operators (north-star extension wave 5): exact
substring-level duplication detection, inverted-index phrase search, and
exact corpus heavy hitters.

These complement the document-level dedup family (queries/dedup.py — whole
docs via MinHash/SimHash/Jaccard) with the *intra-document passage* view a
training-data pipeline also needs: repeated boilerplate passages shared
across documents (the "Deduplicating Training Data Makes Language Models
Better" problem — suffix-style repeated-substring removal, approximated
here at fixed n-gram granularity so the plan stays a single hash
aggregation), token-positional search over an inverted index, and the
exact top-k vocabulary scan that sits behind tokenizer/frequency audits.

Scale notes (100 TB):
- ``substring_dedup`` is explode → per-doc DISTINCT → one hash aggregation
  on the gram. Partial (map-side) aggregation absorbs hot grams before the
  shuffle; at extreme scale the groupBy key can be the 60-bit md5 of the
  gram (functions/portable_hash.py) to cut shuffle bytes ~5× — the pattern
  queries/dedup.py already uses for posting joins.
- ``phrase_search`` derives its phrase from the data (top trigram), making
  the plan: gram stream → hash agg → 1-row top-k broadcast → equi-join.
  Never a cartesian; the broadcast side is exactly one row.
- ``heavy_hitters`` is the canonical two-phase top-k: hash agg with map-side
  combine, then TakeOrdered (per-partition top-25 → single 25-row merge on
  the driver) — no global sort of the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineer_development_spark.operators import text as T
from data_engineer_development_spark.sources import load_table

#: fixed passage width (words). 8 is the smallest width at which the
#: synthetic corpus's small vocabulary still separates boilerplate from
#: chance collisions; production passage dedup uses 50-token windows.
_GRAM_N = 8

#: phrase width for the positional search.
_PHRASE_N = 3


def _grams(docs: DataFrame, n: int, with_pos: bool = False) -> DataFrame:
    """(doc_id, [pos,] gram) for every overlapping word n-gram.

    transform(sequence(...)) builds all window starts JVM-side (whole-stage
    codegen — no Python); slice+array_join materializes the gram text.
    """
    toks = F.split(F.col("text"), " ")
    starts = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram_at = lambda i: F.array_join(F.slice(toks, i, n), " ")  # noqa: E731
    base = docs.filter(F.size(toks) >= n)
    if with_pos:
        pairs = F.transform(starts, lambda i: F.struct(i.alias("pos"), gram_at(i).alias("gram")))
        return base.select(
            "doc_id", F.explode(pairs).alias("pg")
        ).select("doc_id", F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram"))
    return base.select(
        "doc_id", F.explode(F.transform(starts, gram_at)).alias("gram")
    )


# --------------------------------------------------------------------------
# Substring-level dedup: word 8-grams appearing in >= 2 distinct documents
# (cross-document repeated passages). Per-doc DISTINCT first so a passage
# repeated inside ONE document does not inflate its document count.
# --------------------------------------------------------------------------
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    grams = _grams(docs, _GRAM_N).distinct()
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc"))
        .filter(F.col("n_docs") >= 2)
        .orderBy("gram")
    )


_SUBSTRING_DEDUP_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (SELECT DISTINCT doc_id,
             array_to_string(list_slice(toks, i, i + {_GRAM_N - 1}), ' ') AS gram
      FROM t, LATERAL unnest(range(1, len(toks) - {_GRAM_N - 2})) AS u(i)
      WHERE len(toks) >= {_GRAM_N})
SELECT gram, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
FROM g GROUP BY gram HAVING COUNT(*) >= 2
ORDER BY gram
"""


# --------------------------------------------------------------------------
# Inverted-index phrase search: find every occurrence of the corpus's most
# frequent trigram. The phrase is data-derived (count DESC, gram ASC
# tiebreak — deterministic), broadcast as a 1-row build side, and matched
# positionally. Returns one row per containing document with its match
# count and first match position (1-based).
# --------------------------------------------------------------------------
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # both consumers (frequency pass, positional match) need the full gram
    # stream — materialize it ONCE rather than exploding the corpus twice
    # (measured 3.6 s → 2.35 s at sf0.1; at cluster scale the same trade
    # holds: one scan+explode written to local scratch beats two full
    # recomputations whenever the stream has >1 consumer)
    grams = _grams(docs, _PHRASE_N, with_pos=True).localCheckpoint()
    top1 = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "gram")
        .limit(1)
        .select(F.col("gram").alias("phrase"))
    )
    return (
        grams.join(F.broadcast(top1), grams["gram"] == top1["phrase"])
        .groupBy("doc_id", "phrase")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("pos").alias("first_pos"),
        )
        .orderBy("doc_id")
    )


_PHRASE_SEARCH_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (SELECT doc_id, i AS pos,
             array_to_string(list_slice(toks, i, i + {_PHRASE_N - 1}), ' ') AS gram
      FROM t, LATERAL unnest(range(1, len(toks) - {_PHRASE_N - 2})) AS u(i)
      WHERE len(toks) >= {_PHRASE_N}),
top1 AS (SELECT gram AS phrase FROM g GROUP BY gram
         ORDER BY COUNT(*) DESC, gram LIMIT 1)
SELECT doc_id, phrase, COUNT(*) AS n_matches, MIN(pos) AS first_pos
FROM g JOIN top1 ON g.gram = top1.phrase
GROUP BY doc_id, phrase
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Exact corpus heavy hitters: top-25 tokens by total occurrences, with
# document frequency. count DESC, token ASC tiebreak keeps the cut
# deterministic.
# --------------------------------------------------------------------------
_TOP_K = 25


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), "token")
        .limit(_TOP_K)
    )


_HEAVY_HITTERS_SQL = f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents)
SELECT token, COUNT(*) AS n_occurrences,
       COUNT(DISTINCT doc_id) AS n_docs
FROM tok GROUP BY token
ORDER BY n_occurrences DESC, token LIMIT {_TOP_K}
"""


# --------------------------------------------------------------------------
# Vocabulary coverage: build the top-V corpus vocabulary (the tokenizer-
# training cut) and report each document's exact OOV occurrence count
# against it — the per-document signal a data pipeline uses to flag
# out-of-distribution text before training. The vocab is a V-row broadcast
# build side; coverage is one token-stream left-join + per-doc aggregate,
# all integer (no float OOV "rate" whose division could diverge
# cross-engine — consumers divide the two columns themselves).
# --------------------------------------------------------------------------
_VOCAB_V = 100


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(_VOCAB_V)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(F.col("in_vocab").isNull(), 1)).alias("n_oov"),
        )
        .orderBy("doc_id")
    )


_VOCAB_COVERAGE_SQL = f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents),
vocab AS (SELECT token FROM toks GROUP BY token
          ORDER BY COUNT(*) DESC, token LIMIT {_VOCAB_V})
SELECT doc_id, COUNT(*) AS n_tokens,
       COUNT(CASE WHEN v.token IS NULL THEN 1 END) AS n_oov
FROM toks t LEFT JOIN vocab v ON t.token = v.token
GROUP BY doc_id ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Vocabulary-size coverage curve — STAGED for r14+ registration: the dial
# a tokenizer owner reads before fixing the vocabulary budget. For each
# candidate size V, what fraction of corpus token OCCURRENCES would fall
# out of the top-V frequency-cut vocabulary? (vocab_coverage reports
# per-document OOV against ONE fixed V; this is the corpus-level curve
# across sizes — the marginal value of each vocabulary doubling.) Exact
# integer occurrence sums; one IEEE division per row.
#
# Scale shape: token counts are one map-side-combinable agg; the
# frequency rank uses operators/ranking.with_global_rank (corpus-scale
# vocabularies must never hit a single-partition global window — the
# dictionary_encode discipline); the per-size sums are ONE conditional
# aggregate over the ranked counts (sizes are a 4-element literal, so no
# join, no second pass), unpivoted via inline array explode.
# --------------------------------------------------------------------------
_VOCAB_SIZES = (25, 50, 100, 200)


def q_tokenizer_vocab_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineer_development_spark.operators.ranking import (
        with_global_rank,
    )

    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    cnts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    rk = with_global_rank(
        cnts, F.col("cnt").desc(), F.col("token"), rank_col="r"
    )
    one = rk.agg(
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("n_vocab"),
        *[
            F.coalesce(
                F.sum(F.when(F.col("r") <= v, F.col("cnt"))), F.lit(0)
            ).alias(f"c{v}")
            for v in _VOCAB_SIZES
        ],
    )
    curve = ", ".join(
        f"named_struct('vocab_size', {v}, 'covered', c{v})"
        for v in _VOCAB_SIZES
    )
    return (
        one.select(
            "total", "n_vocab", F.explode(F.expr(f"array({curve})")).alias("s")
        )
        .select(
            F.col("s.vocab_size").cast("int").alias("vocab_size"),
            F.least(F.col("s.vocab_size").cast("long"), F.col("n_vocab"))
            .cast("long")
            .alias("vocab_tokens"),
            F.col("s.covered").cast("long").alias("covered_occ"),
            F.col("total").cast("long").alias("total_occ"),
            (
                (F.col("total") - F.col("s.covered")).cast("double")
                / F.col("total").cast("double")
            ).alias("oov_rate"),
        )
        .orderBy("vocab_size")
    )


_VOCAB_CURVE_SQL = f"""
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token
              FROM documents),
cnts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks
         GROUP BY token),
rk AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS r
       FROM cnts),
sizes(v) AS (VALUES {', '.join(f'({v})' for v in _VOCAB_SIZES)})
SELECT CAST(s.v AS INT) AS vocab_size,
       CAST(LEAST(s.v, (SELECT COUNT(*) FROM cnts)) AS BIGINT)
           AS vocab_tokens,
       CAST(COALESCE(SUM(CASE WHEN rk.r <= s.v THEN rk.cnt END), 0)
            AS BIGINT) AS covered_occ,
       CAST(SUM(rk.cnt) AS BIGINT) AS total_occ,
       CAST(SUM(rk.cnt) - COALESCE(SUM(CASE WHEN rk.r <= s.v
                                            THEN rk.cnt END), 0) AS DOUBLE)
         / CAST(SUM(rk.cnt) AS DOUBLE) AS oov_rate
FROM sizes s CROSS JOIN rk
GROUP BY s.v ORDER BY vocab_size
"""


# --------------------------------------------------------------------------
# BM25 top-k search — STAGED for r14+ registration: the classic IR
# ranking (Okapi BM25, k1 = 6/5, b = 3/4) that completes the retrieval
# family next to tfidf_top_terms (no length normalization) and
# phrase_search (positional match). The whole per-(doc, term) score is
# ONE exact-integer fraction: with rational idf = (2N−2df+1)/(2df+1)
# (the tfidf log-free convention), avgdl = T/N, everything clears to
#
#   score = 44·tf·(2N−2df+1)·T
#           ─────────────────────────────────────
#           (2df+1)·(20·T·tf + 6·T + 18·dl·N)
#
# so the only float op is the final IEEE division, and the ≤3-term doc
# total is a FIXED-ORDER a+b+c of those doubles (conditional-aggregate
# pivot — never a SUM() whose accumulation order could differ between
# engines). Int64 bounds: num ≤ 44·tf·2N·T, den ≤ (2N+1)·(20·T·tf+…) —
# safe to T ≈ 10¹² corpus tokens at fixture-like tf; past that pre-scale
# T (document the bound, don't discover it).
#
# Scale shape: tf only over the ≤|Q| query terms (scan-side IN filter →
# the postings are query-sized, not corpus-sized), dl/N/T are one
# map-side-combinable agg each, the 1-row corpus stats broadcast, and
# the top-k is a TakeOrdered (orderBy+limit), never a global sort.
# --------------------------------------------------------------------------
_BM25_QUERY = ("merge", "window", "stream")
_BM25_K = 15


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    )
    toks = docs.select("doc_id", F.explode("t").alias("term")).filter(
        F.col("term") != ""
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("t_tokens")
    )
    qterms = list(_BM25_QUERY)
    tf = (
        toks.filter(F.col("term").isin(qterms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "num",
            F.expr("44 * tf * (2 * n_docs - 2 * df + 1) * t_tokens"),
        )
        .withColumn(
            "den",
            F.expr(
                "(2 * df + 1) * (20 * t_tokens * tf + 6 * t_tokens"
                " + 18 * dl * n_docs)"
            ),
        )
        .withColumn("s", F.col("num").cast("double") / F.col("den").cast("double"))
    )
    parts = [
        F.coalesce(
            F.max(F.when(F.col("term") == q, F.col("s"))), F.lit(0.0)
        ).alias(f"s{i}")
        for i, q in enumerate(qterms)
    ]
    per_doc = scored.groupBy("doc_id", "dl").agg(*parts)
    # fixed-order left-fold sum ((s0 + s1) + s2) ... — identical IEEE in
    # both engines, and GENERATED from the query tuple so a term added to
    # _BM25_QUERY cannot be silently dropped (review r13 finding)
    acc = F.col("s0")
    for i in range(1, len(qterms)):
        acc = acc + F.col(f"s{i}")
    total = per_doc.select(
        "doc_id",
        F.col("dl").cast("long").alias("dl"),
        acc.alias("score"),
    )
    return total.orderBy(F.col("score").desc(), "doc_id").limit(_BM25_K)


_BM25_TERMS_IN = ", ".join(f"'{q}'" for q in _BM25_QUERY)
_BM25_CASES = ",\n".join(
    f"             COALESCE(MAX(CASE WHEN term = '{q}' THEN s END), 0.0)"
    f" AS s{i}" for i, q in enumerate(_BM25_QUERY)
)
# left-fold sum generated from the same tuple as the cases — and no
# trailing comma before FROM (only DuckDB tolerates one; review r13)
_BM25_FOLD = "s0"
for _i in range(1, len(_BM25_QUERY)):
    _BM25_FOLD = f"({_BM25_FOLD} + s{_i})"
_BM25_SQL = f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents),
tk AS (SELECT doc_id, term FROM toks WHERE term <> ''),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tk
       GROUP BY doc_id),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(dl) AS BIGINT) AS t_tokens FROM dl),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tk
       WHERE term IN ({_BM25_TERMS_IN}) GROUP BY doc_id, term),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
sc AS (SELECT tf.doc_id, tf.term, dl.dl,
              CAST(44 * tf.tf * (2 * st.n_docs - 2 * df.df + 1)
                   * st.t_tokens AS DOUBLE)
              / CAST((2 * df.df + 1) * (20 * st.t_tokens * tf.tf
                     + 6 * st.t_tokens + 18 * dl.dl * st.n_docs)
                     AS DOUBLE) AS s
       FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
pd AS (SELECT doc_id, dl,
{_BM25_CASES}
       FROM sc GROUP BY doc_id, dl)
SELECT doc_id, dl, {_BM25_FOLD} AS score
FROM pd ORDER BY score DESC, doc_id LIMIT {_BM25_K}
"""


# --------------------------------------------------------------------------
# Training-export roundtrip: shard the corpus into hash buckets, write it
# as partitioned JSONL (the interchange format training loaders consume),
# read the export back with an EXPLICIT schema (never inference — at scale
# schema inference is a full extra pass), and report per-shard counts and
# byte totals from the re-read data. The oracle computes the same shard
# stats straight from the source table, so a hash match proves the JSON
# sink/source preserved every row and value. Sharding is the deterministic
# md5 bucket (functions/portable_hash.py) — reproducible across runs and
# engines, unlike a rand()/round-robin split.
# --------------------------------------------------------------------------
_EXPORT_BUCKETS = 8


def q_export_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile
    import uuid

    from data_engineer_development_spark.functions.portable_hash import (
        spark_md5_int,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    bucket = F.expr(
        f"{spark_md5_int('cast(doc_id as string)')} % {_EXPORT_BUCKETS}"
    ).cast("int")
    out = os.path.join(
        tempfile.gettempdir(), f"jsonl-export-{uuid.uuid4().hex}"
    )
    try:
        docs.withColumn("bucket", bucket).write.partitionBy(
            "bucket"
        ).mode("overwrite").json(out)
        back = spark.read.schema(
            "doc_id long, text string, lang string, source string, "
            "n_chars long, bucket int"
        ).json(out)
        return (
            back.groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
                F.sum(F.length("text")).alias("total_text_len"),
            )
            .orderBy("bucket")
            .localCheckpoint()  # materialize BEFORE the export dir vanishes
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


_EXPORT_SQL = f"""
SELECT CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
            AS BIGINT) % {_EXPORT_BUCKETS} AS INTEGER) AS bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(length(text)) AS BIGINT) AS total_text_len
FROM documents
GROUP BY 1 ORDER BY 1
"""


def q_export_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink/source fidelity under the fields that break naive CSV:
    embedded commas, double quotes, NEWLINES, and backslashes.

    Each document gets a synthesized hostile field (quote + comma +
    newline + backslash spliced around real text); the corpus is written
    RFC-4180 style (escape = quote char, i.e. `""` doubling — Spark's
    default escape is backslash, which most non-Spark readers misparse),
    read back with multiLine (quoted newlines span physical lines), and
    aggregated. The oracle computes the same aggregates straight from the
    source table, so ANY corruption in the quote/escape/newline round trip
    shifts a checksum and breaks the hash match.

    Scale: partitioned write + schema'd read, no inference pass; multiLine
    CSV is NOT splittable within a file — at 100 TB keep hostile-field
    exports in many moderate files (the partitioned write here) or prefer
    JSONL/parquet (export_jsonl_roundtrip)."""
    import os
    import shutil
    import tempfile
    import uuid

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        F.concat(
            F.lit('a,"b'),
            F.lit("\n"),
            F.substring("text", 1, 10),
            F.lit("\\x"),
            F.col("lang"),
        ).alias("tricky"),
    )
    out = os.path.join(tempfile.gettempdir(), f"csv-export-{uuid.uuid4().hex}")
    try:
        docs.write.option("header", True).option("escape", '"').mode(
            "overwrite"
        ).csv(out)
        back = (
            spark.read.schema(
                "doc_id long, lang string, n_chars long, tricky string"
            )
            .option("header", True)
            .option("escape", '"')
            .option("multiLine", True)
            .csv(out)
        )
        return (
            back.groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
                F.sum(F.length("tricky")).alias("total_tricky_len"),
            )
            .orderBy("lang")
            .localCheckpoint()  # materialize BEFORE the export dir vanishes
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


_EXPORT_CSV_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(length(concat('a,"b', chr(10), substr(text, 1, 10), '\\x',
                              lang))) AS BIGINT)
         AS total_tricky_len
FROM documents
GROUP BY lang ORDER BY lang
"""


def q_export_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink/source fidelity — the third columnar surface next to the
    parquet scans and the JSONL/CSV exports (Spark ships the ORC
    reader/writer natively; warehouses downstream of a training pipeline
    often ingest ORC, so the engine must round-trip it losslessly).

    Same checksum contract as export_jsonl_roundtrip: write the corpus to
    ORC, read it back with an explicit schema (no inference pass), and
    aggregate; the oracle computes identical aggregates straight from the
    source table, so any corruption in the ORC encode/decode — string
    encoding, null handling, long overflow — breaks the hash match.

    Scale: ORC is splittable and predicate-pushdown-capable like parquet;
    the partitioned parallel write and schema'd read are exactly the shape
    a 100 TB export takes."""
    import os
    import shutil
    import tempfile
    import uuid

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", "text"
    )
    out = os.path.join(tempfile.gettempdir(), f"orc-export-{uuid.uuid4().hex}")
    try:
        docs.write.mode("overwrite").orc(out)
        back = spark.read.schema(
            "doc_id long, lang string, n_chars long, text string"
        ).orc(out)
        return (
            back.groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
                F.sum(F.length("text")).alias("total_text_len"),
            )
            .orderBy("lang")
            .localCheckpoint()  # materialize BEFORE the export dir vanishes
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


_EXPORT_ORC_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(length(text)) AS BIGINT) AS total_text_len
FROM documents
GROUP BY lang ORDER BY lang
"""


def q_dictionary_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical dictionary encoding — the id-mapping step between
    tokenizer training and tensor export: rank the corpus vocabulary by
    (frequency DESC, token) into dense ids, then re-encode every document
    as ids. Emitted per doc as exact integer checksums (sum/max of ids)
    so the whole mapping — rank order, tie-breaks, join fan-out — is
    value-checked without shipping arrays through the hash gate.

    Scale: the vocabulary is smaller than the corpus but NOT bounded — a
    100 TB web corpus has billions of distinct tokens, so the rank is a
    two-pass partition-offset row_number (operators/ranking.py): range-
    partitioned parallel sorts + a bounded offsets broadcast, never a
    single-partition global Window. The id map then broadcasts into the
    token-level join; the token explode aggregates straight back to
    per-doc — one shuffle each side."""
    from data_engineer_development_spark.operators.ranking import (
        with_global_rank,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn("t", T.tokens())
    toks = docs.select("doc_id", F.explode("t").alias("token"))
    vocab = with_global_rank(
        toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt")),
        F.desc("cnt"),
        F.asc("token"),
        rank_col="token_id",
    ).select("token", F.col("token_id").cast("bigint").alias("token_id"))
    return (
        toks.join(F.broadcast(vocab), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("token_id").alias("ids_checksum"),
            F.max("token_id").alias("max_token_id"),
        )
        .orderBy("doc_id")
    )


_DICTIONARY_ENCODE_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
vocab AS (SELECT token,
                 ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS token_id
          FROM tok GROUP BY token)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(v.token_id) AS BIGINT) AS ids_checksum,
       CAST(MAX(v.token_id) AS BIGINT) AS max_token_id
FROM tok t JOIN vocab v ON t.token = v.token
GROUP BY t.doc_id ORDER BY t.doc_id
"""


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first step of BPE/WordPiece tokenizer training: corpus-wide
    adjacent-pair frequencies, top 20. (A full BPE trainer iterates
    merge→recount; each round is exactly this plan, so the one-round
    entry pins the building block.)

    Plan: per-doc pair explode (row-local struct build, no shuffle) →
    hash agg with map-side combine → TakeOrdered top-20. The LIMIT
    boundary is made deterministic by the full (count DESC, left, right)
    tie-break ordering. Scale: identical shape to heavy_hitters; the pair
    vocabulary is larger than the unigram one but partial aggregation
    absorbs the hot pairs before the exchange."""
    docs = load_table(spark, sf_dir, "documents").withColumn("t", T.tokens())
    # Guard size(t) < 2: sequence(0, -1) DESCENDS in Spark (yielding
    # phantom pairs non-ANSI, an index error ANSI), while the oracle's
    # range(1, len(t)) is simply empty — same hazard shingles_expr gates.
    pairs = docs.select(
        F.explode(
            F.expr(
                "if(size(t) < 2, array(),"
                " transform(sequence(0, size(t) - 2),"
                " i -> struct(t[i] AS a, t[i+1] AS b)))"
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(
            F.col("p.a").alias("token_left"), F.col("p.b").alias("token_right")
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "token_left", "token_right")
        .limit(20)
    )


_BPE_PAIR_COUNTS_SQL = """
WITH d AS (SELECT string_split(text, ' ') AS t FROM documents),
p AS (SELECT t[i] AS token_left, t[i + 1] AS token_right
      FROM d, LATERAL unnest(range(1, len(t))) AS u(i))
SELECT token_left, token_right, COUNT(*) AS n_pairs
FROM p GROUP BY 1, 2
ORDER BY n_pairs DESC, token_left, token_right
LIMIT 20
"""


QUERIES = {
    "substring_dedup": q_substring_dedup,
    "phrase_search": q_phrase_search,
    "heavy_hitters": q_heavy_hitters,
    "vocab_coverage": q_vocab_coverage,
    "export_jsonl_roundtrip": q_export_jsonl_roundtrip,
    "bpe_pair_counts": q_bpe_pair_counts,
    "export_csv_roundtrip": q_export_csv_roundtrip,
    "export_orc_roundtrip": q_export_orc_roundtrip,
    "dictionary_encode": q_dictionary_encode,
    # registered r14 (staged r13, tri-SF + ANSI-on parity on record)
    "tokenizer_vocab_curve": q_tokenizer_vocab_curve,
    "bm25_topk": q_bm25_topk,
}

ORACLE = {
    "tokenizer_vocab_curve": _VOCAB_CURVE_SQL,
    "bm25_topk": _BM25_SQL,
    "substring_dedup": _SUBSTRING_DEDUP_SQL,
    "phrase_search": _PHRASE_SEARCH_SQL,
    "heavy_hitters": _HEAVY_HITTERS_SQL,
    "vocab_coverage": _VOCAB_COVERAGE_SQL,
    "export_jsonl_roundtrip": _EXPORT_SQL,
    "bpe_pair_counts": _BPE_PAIR_COUNTS_SQL,
    "export_csv_roundtrip": _EXPORT_CSV_SQL,
    "export_orc_roundtrip": _EXPORT_ORC_SQL,
    "dictionary_encode": _DICTIONARY_ENCODE_SQL,
}
