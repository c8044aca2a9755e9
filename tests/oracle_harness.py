"""Local re-implementation of the driver's correctness gate (SURVEY.md §5).

Runs a ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet dir, sorts columns by name and rows by value, and compares
exactly. Exact comparison is deliberate: the driver hashes values, so a
float that differs in the last bit is a failure — our aggregates go through
decimal accumulation precisely to make exact comparison achievable.
"""

from __future__ import annotations

import datetime
import math

import duckdb

from data_engineer_development_spark.cache import release_tracked

TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, list):
        return ("l", tuple(_norm(x) for x in v))
    return (type(v).__name__, v)


def _normalize_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark, sf_dir: str, name: str, query_fn, sql: str) -> tuple[bool, str]:
    sdf = query_fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    # Queries may persist() bounded intermediates (LSH shingles/signatures,
    # posting lists) that the lazy return value consumes — release exactly
    # those via the tracked registry so cached partitions don't accumulate
    # across a 150+-entry sweep (clearCache stays as a belt-and-braces
    # backstop for anything cached outside the registry, e.g. pipeline
    # tables).
    release_tracked()
    spark.catalog.clearCache()

    con = duckdb_conn(sf_dir)
    # Fetch through Arrow, exactly like the driver's gate. fetchall()
    # silently coerces DuckDB's HUGEINT (the type of SUM(<integer>))
    # back to Python int, hiding the decimal128(38,0)-vs-int64
    # divergence that broke 8 driver rows in round 6 — the typed Arrow
    # leg makes that class of fetch-path mismatch fail locally.
    tbl = con.execute(sql).arrow()
    dcols = list(tbl.column_names)
    drows = [
        tuple(d[c] for c in dcols) for d in tbl.to_pylist()
    ]
    con.close()

    if sorted(scols) != sorted(dcols):
        return False, f"{name}: column mismatch spark={sorted(scols)} duckdb={sorted(dcols)}"
    if len(srows) != len(drows):
        return False, f"{name}: rowcount mismatch spark={len(srows)} duckdb={len(drows)}"

    a = _normalize_rows(scols, srows)
    b = _normalize_rows(dcols, drows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"{name}: value mismatch, first diffs: {diffs}"
    return True, f"{name}: OK ({len(srows)} rows)"
