"""The local gate must see the DRIVER's types (round-6 lesson).

The driver fetches DuckDB through Arrow, where ``SUM(<integer>)`` surfaces
as HUGEINT → decimal128(38,0) → Python Decimal, while Spark returns int64.
``fetchall()`` silently coerces that back to int, which kept 8 broken
oracles locally green in round 6. These tests pin the harness to the typed
fetch path: an uncast integer SUM must FAIL compare(), and the CAST that
fixes it must pass.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from tests.oracle_harness import compare, duckdb_conn


def _spark_sum(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/region.parquet")
        .agg(F.sum("r_regionkey").alias("s"))
    )


def test_uncast_integer_sum_fails_typed_compare(spark):
    ok, msg = compare(
        spark, SF_CORRECT, "hugeint_repro", _spark_sum,
        "SELECT SUM(r_regionkey) AS s FROM region",
    )
    assert not ok, (
        "harness no longer sees DuckDB HUGEINT as typed Decimal — the "
        f"driver fetch-path blind spot is back: {msg}"
    )


def test_cast_bigint_sum_passes(spark):
    ok, msg = compare(
        spark, SF_CORRECT, "hugeint_fixed", _spark_sum,
        "SELECT CAST(SUM(r_regionkey) AS BIGINT) AS s FROM region",
    )
    assert ok, msg


def test_duckdb_arrow_types_integer_sum_as_decimal():
    """Documents the mechanism itself: HUGEINT crosses Arrow as
    decimal128(38,0). If a DuckDB upgrade changes this, the other two
    tests tell us whether the harness still matches the driver."""
    con = duckdb_conn(SF_CORRECT)
    tbl = con.execute("SELECT SUM(r_regionkey) AS s FROM region").arrow()
    con.close()
    import pyarrow as pa

    assert pa.types.is_decimal(tbl.schema.field("s").type)
