"""Sources / scans (SURVEY.md §2.1).

Spark-first restatement of the reference's ingest surface:

- S3 typed CSV/TSV load (reference: GoogleCloudStorageToBigQueryOperator with
  an explicit 46-col schema, tab-delim, skip_leading_rows=1, autodetect=False
  — /root/reference/airflow-dags/export_svg.py:143-205) → ``read_typed_csv``.
- S2 decompress + NUL-byte cleanup (reference: ``gsutil|gunzip|tr '\\0' ' '``
  — export_svg.py:107-113) → ``read_gz_text_clean`` (Spark decompresses .gz
  transparently; the byte fix is a vectorized regexp_replace, not a shell pipe).
- S4/S5 table scans & partition-discovered parquet → ``load_table``.

At 100 TB these readers matter because they are the *only* place schemas are
declared: explicit StructType means the parquet/CSV scan never pays an
inference pass, and column pruning/predicate pushdown start from a typed scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: the driver-provided star schema (TESTDATA.md) — every query module reads
#: from these names so a different sf_dir swaps scale transparently.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events ``ts`` column to TIMESTAMP (LTZ, epoch-UTC).

    The driver testdata has shipped ``ts`` two ways across rounds:
    parquet TIMESTAMP(NANOS) — which with
    ``spark.sql.legacy.parquet.nanosAsLong`` arrives as a long we truncate to
    micros, the same nano→micro truncation DuckDB applies — and plain
    ``timestamp[us]`` with no zone, which Spark 4 reads as TIMESTAMP_NTZ.
    Watermarks require LTZ, so the NTZ wall clock is pinned AS UTC:
    ``convert_timezone('UTC', current_timezone(), ntz)`` rewrites the wall
    clock into the session zone's rendering of that UTC instant, so the
    following LTZ cast (which interprets wall clock in the SESSION zone)
    lands on the exact instant the file stored. This is identity under a
    UTC session and — unlike a bare ``to_utc_timestamp(col, 'UTC')``, which
    first session-casts the NTZ and is then a no-op — stays correct under
    any session timezone, keeping batch, streaming and DuckDB's naive
    reading of the same file bit-for-bit aligned.
    """
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn(
            col,
            F.convert_timezone(
                F.lit("UTC"), F.current_timezone(), F.col(col)
            ).cast("timestamp"),
        )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table (S4). Plain ``spark.read.parquet`` keeps the
    scan eligible for column pruning, predicate pushdown and (when the layout
    has partition dirs) partition pruning — verified via .explain in tests.

    ``spark.sql.legacy.parquet.nanosAsLong`` is needed only while the scan is
    planned against a TIMESTAMP(NANOS) file; it is set for the read and the
    caller's previous value restored after, so a caller-provided session —
    e.g. the correctness harness's own — is left exactly as it arrived.
    """
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    needed_nanos = name == "events" and dict(df.dtypes).get("ts") == "bigint"
    if name == "events":
        df = normalize_event_ts(df)
    if not needed_nanos:
        # leave the caller's session exactly as it arrived; when the file IS
        # nanos the conf must stay live until the job runs, so it is kept
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register the star schema as temp views so ``spark.sql`` text queries
    (the reference's native idiom — all semantics live in SQL strings,
    export_svg.py:209-694) can address tables by name."""
    for n in names or TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def read_typed_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    sep: str = "\t",
    header: bool = True,
) -> DataFrame:
    """S3: typed delimited load with an explicit schema.

    Mirrors export_svg.py:198-203 semantics: ``autodetect=False`` → explicit
    schema (never inferSchema: at 100 TB an inference pass is a full extra
    scan); ``skip_leading_rows=1`` → header=True; tab-delimited.
    """
    return (
        spark.read.schema(schema)
        .option("sep", sep)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def fetch_to_landing(url: str, dest_path: str, timeout: int = 60) -> str:
    """S1: HTTP download source — GET a remote file into the landing dir.

    The reference buffers ``requests.get(url)`` to /tmp then uploads to GCS
    (export_svg.py:85-105); ingest stays off-cluster in both designs — the
    cluster's first touch is the typed read of the landed file. Uses stdlib
    urllib (no extra deps); caller provides the landing path.
    """
    import os
    import urllib.request

    os.makedirs(os.path.dirname(dest_path) or ".", exist_ok=True)
    with urllib.request.urlopen(url, timeout=timeout) as resp, open(
        dest_path, "wb"
    ) as out:
        while True:
            chunk = resp.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)
    return dest_path


def read_external_partitioned(
    spark: SparkSession, source_uri_prefix: str, fmt: str = "parquet"
) -> DataFrame:
    """S5: hive-partitioned external table — files under a prefix become a
    queryable relation with partitions auto-inferred from ``key=value`` dir
    layout (reference: HivePartitioningOptions(mode="AUTO"),
    bigquery.py:66-85). Spark's partition discovery is the AUTO analogue,
    and partition-column filters prune directories before any I/O.
    """
    return spark.read.format(fmt).load(source_uri_prefix)


def read_gz_text_clean(spark: SparkSession, path: str) -> DataFrame:
    """S2: read (possibly gzipped) text and strip NUL bytes.

    The reference shells out ``gunzip | tr '\\0' ' '`` (export_svg.py:110);
    Spark's text source is codec-transparent for .gz, and the byte fix is a
    JVM-side regexp_replace so it stays inside whole-stage codegen. One
    caveat carried to the 100 TB design: .gz is not splittable, so a huge
    single gzip file would read on one task — the pipeline repartitions right
    after this read (see pipeline.py) exactly because of that.
    """
    return spark.read.text(path).select(
        F.regexp_replace(F.col("value"), "\\x00", " ").alias("value")
    )
