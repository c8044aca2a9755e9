"""Drive every queries()/oracle_sql() pair through the local oracle harness
at sf0.01 — the same gate the driver applies."""

from __future__ import annotations

import pytest

from data_engineer_development_spark.queries import all_oracles, all_queries
from tests.conftest import SF_CORRECT
from tests.oracle_harness import compare

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.fixture(params=["off", "on"], ids=["ansi_off", "ansi_on"])
def ansi_mode(spark, request):
    """Run every pair under BOTH ANSI modes: the repo session is ANSI-off
    (session.py), but the driver's correctness gate builds a default Spark 4
    session with ANSI ON — round 5 proved local ANSI-off green does not imply
    driver green (getItem threw INVALID_ARRAY_INDEX only under the driver).
    spark.sql.ansi.enabled is a runtime conf, so one session serves both legs.
    """
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set(
        "spark.sql.ansi.enabled", "true" if request.param == "on" else "false"
    )
    yield request.param
    spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, ansi_mode, name):
    ok, msg = compare(spark, SF_CORRECT, name, _QUERIES[name], _ORACLES[name])
    assert ok, f"[ansi_{ansi_mode}] {msg}"


def test_every_query_runs_and_has_rows(spark):
    for name, fn in _QUERIES.items():
        df = fn(spark, SF_CORRECT)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
