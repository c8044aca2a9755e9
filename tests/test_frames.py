"""functions/frames.jvm_rows_df — the JVM-literal createDataFrame
replacement (round-15 Python-rows commit-tax fix) and its ADVICE r15
hardening: real DDL parsing and fail-at-construction arity checks."""

from __future__ import annotations

from decimal import Decimal

import pytest

from data_engineer_development_spark.functions import jvm_rows_df


def test_jvm_rows_df_matches_createdataframe(spark):
    ddl = "k long, name string, flag boolean"
    rows = [(1, "a", True), (2, None, False), (3, "c", None)]
    got = jvm_rows_df(spark, ddl, rows)
    want = spark.createDataFrame(rows, ddl)
    # simpleString: names + types (literal plans legitimately tighten
    # nullability on all-non-null columns — a superset contract)
    assert got.schema.simpleString() == want.schema.simpleString()
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_jvm_rows_df_parameterized_types(spark):
    """ADVICE r15: comma-bearing parameterized types (decimal(10,2),
    array<bigint>) must parse as ONE column each — the old naive
    comma split shredded them into bogus columns."""
    ddl = "price decimal(10,2), tags array<bigint>, k int"
    rows = [
        (Decimal("12.34"), [1, 2], 7),
        (Decimal("0.01"), None, 8),
    ]
    got = jvm_rows_df(spark, ddl, rows)
    assert [f.name for f in got.schema.fields] == ["price", "tags", "k"]
    want = spark.createDataFrame(rows, ddl)
    assert got.schema.simpleString() == want.schema.simpleString()
    g = {r["k"]: (r["price"], r["tags"]) for r in got.collect()}
    w = {r["k"]: (r["price"], r["tags"]) for r in want.collect()}
    assert g == w


def test_jvm_rows_df_empty_typed(spark):
    df = jvm_rows_df(spark, "a bigint, b decimal(10,2)", [])
    assert df.count() == 0
    assert df.schema.simpleString() == (
        "struct<a:bigint,b:decimal(10,2)>"
    )


def test_jvm_rows_df_arity_mismatch_raises(spark):
    """ADVICE r15: a short/long row must fail at construction with the
    offending row index — never a silent zip truncation that drops a
    column's value."""
    with pytest.raises(ValueError, match="row 1 has 3 values"):
        jvm_rows_df(spark, "a long, b string", [(1, "x"), (2, "y", 3)])
    with pytest.raises(ValueError, match="row 0 has 1 value"):
        jvm_rows_df(spark, "a long, b string", [(1,)])
