"""Scalar-function operator queries (SURVEY.md §2.9, F6-F10 + engine extras).

Each exercises one scalar surface end-to-end with a DuckDB oracle; the JSON /
base64 pair mirrors the reference's message envelope exactly
(transfer_sercom_files.py:115-123).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineer_development_spark.functions import base64_json
from data_engineer_development_spark.sources import load_table


# --------------------------------------------------------------------------
# F9/K11: base64(JSON) message envelope — the Pub/Sub publish payload shape
# (transfer_sercom_files.py:120: json.dumps → b64encode). Spark to_json and
# DuckDB to_json produce identical compact JSON for flat structs.
# --------------------------------------------------------------------------
def q_message_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    return ev.select(
        "event_id",
        base64_json(
            F.col("user_id").alias("user_id"),
            F.col("event_type").alias("event_type"),
        ).alias("payload"),
    ).orderBy("event_id")


_MESSAGE_ENVELOPE_SQL = """
SELECT event_id,
       base64(encode(to_json(struct_pack(user_id := user_id,
                                         event_type := event_type))::VARCHAR)) AS payload
FROM events WHERE event_id < 1000 ORDER BY event_id
"""


# --------------------------------------------------------------------------
# JSON extraction (engine extra — the reference only serializes JSON, never
# parses it; parsing is required for the events.props column).
# --------------------------------------------------------------------------
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        )
        .filter(F.col("k_value") > 50)
        .orderBy("event_id")
    )


_JSON_EXTRACT_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
ORDER BY event_id
"""


# --------------------------------------------------------------------------
# F10 analogue: regexp cleanup + length accounting (the NUL-strip shape,
# export_svg.py:110, generalized to a character-class strip).
# --------------------------------------------------------------------------
def q_regexp_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cleaned = F.regexp_replace(F.col("text"), "[aeiou]", "")
    return docs.select(
        "doc_id",
        F.length("text").alias("len_raw"),
        F.length(cleaned).alias("len_clean"),
    ).orderBy("doc_id")


_REGEXP_CLEAN_SQL = """
SELECT doc_id,
       LENGTH(text) AS len_raw,
       LENGTH(regexp_replace(text, '[aeiou]', '', 'g')) AS len_clean
FROM documents ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# String function suite: upper/substr/trim/lpad/concat_ws/replace.
# --------------------------------------------------------------------------
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.lpad(F.col("c_custkey").cast("string"), 9, "0").alias("key_padded"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("tagged"),
        F.length(F.trim(F.lit("  x  "))).alias("trimmed_len"),
    ).orderBy("c_custkey")


_STRING_FUNCS_SQL = """
SELECT c_custkey,
       UPPER(c_name) AS name_upper,
       SUBSTR(c_name, 1, 8) AS name_prefix,
       LPAD(CAST(c_custkey AS VARCHAR), 9, '0') AS key_padded,
       CONCAT_WS('|', c_mktsegment, c_name) AS tagged,
       LENGTH(TRIM('  x  ')) AS trimmed_len
FROM customer WHERE c_custkey < 200 ORDER BY c_custkey
"""


# --------------------------------------------------------------------------
# NULL-handling suite: coalesce / nullif / conditional default — the
# engine-side generalization of sentinel cleansing (export_svg.py:211-244).
# --------------------------------------------------------------------------
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")).alias("seg_nulled"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("UNKNOWN")
        ).alias("seg_defaulted"),
        F.when(F.col("c_acctbal") < 0, 0.0).otherwise(F.col("c_acctbal")).alias(
            "bal_floor"
        ),
    ).orderBy("c_custkey")


_NULL_HANDLING_SQL = """
SELECT c_custkey,
       NULLIF(c_mktsegment, 'MACHINERY') AS seg_nulled,
       COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'UNKNOWN') AS seg_defaulted,
       CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS bal_floor
FROM customer ORDER BY c_custkey
"""


# --------------------------------------------------------------------------
# Math suite (IEEE-exact ops only: abs/ceil/floor/round/sqrt/mod — libm
# functions like ln/exp are deliberately excluded from oracle checks since
# JVM and DuckDB libm differ in the last ulp).
# --------------------------------------------------------------------------
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000.0).alias("abs_delta"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.floor("p_retailprice").alias("price_floor"),
        F.round("p_retailprice", 1).alias("price_round1"),
        F.sqrt(F.abs("p_retailprice")).alias("price_sqrt"),
        (F.col("p_partkey") % 7).alias("key_mod7"),
    ).orderBy("p_partkey")


_MATH_FUNCS_SQL = """
SELECT p_partkey,
       ABS(p_retailprice - 1000.0) AS abs_delta,
       CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
       CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
       ROUND(p_retailprice, 1) AS price_round1,
       SQRT(ABS(p_retailprice)) AS price_sqrt,
       p_partkey % 7 AS key_mod7
FROM part ORDER BY p_partkey
"""


# --------------------------------------------------------------------------
# Spark 4 VARIANT path for semi-structured data: parse_json once into the
# binary variant encoding, then extract typed fields with variant_get —
# the at-scale replacement for get_json_object string re-parsing (each
# get_json_object call re-parses the JSON text; a variant column parses
# once and every extraction is a binary-offset read). Rolled up per
# extracted value so the oracle checks the full distribution, not a
# sample.
# --------------------------------------------------------------------------
def q_variant_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        F.parse_json(F.col("props")).alias("var"), "event_type"
    )
    k = F.expr("variant_get(var, '$.k', 'long')")
    return (
        v.select("event_type", k.alias("k_value"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k_value").alias("k_sum"),
            F.min("k_value").alias("k_min"),
            F.max("k_value").alias("k_max"),
        )
        .orderBy("event_type")
    )


_VARIANT_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS k_sum,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
FROM events GROUP BY event_type ORDER BY event_type
"""


QUERIES = {
    "message_envelope": q_message_envelope,
    "json_extract": q_json_extract,
    "variant_json_stats": q_variant_json_stats,
    "regexp_clean": q_regexp_clean,
    "string_funcs": q_string_funcs,
    "null_handling": q_null_handling,
    "math_funcs": q_math_funcs,
}

ORACLE = {
    "variant_json_stats": _VARIANT_SQL,
    "message_envelope": _MESSAGE_ENVELOPE_SQL,
    "json_extract": _JSON_EXTRACT_SQL,
    "regexp_clean": _REGEXP_CLEAN_SQL,
    "string_funcs": _STRING_FUNCS_SQL,
    "null_handling": _NULL_HANDLING_SQL,
    "math_funcs": _MATH_FUNCS_SQL,
}
