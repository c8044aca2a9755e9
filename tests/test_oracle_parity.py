"""Drive every queries()/oracle_sql() pair through the local oracle harness
at sf0.01 — the same gate the driver applies."""

from __future__ import annotations

import pytest

from data_engineer_development_spark.queries import all_oracles, all_queries
from tests.conftest import SF_CORRECT
from tests.oracle_harness import compare

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, name):
    ok, msg = compare(spark, SF_CORRECT, name, _QUERIES[name], _ORACLES[name])
    assert ok, msg


def test_every_query_runs_and_has_rows(spark):
    for name, fn in _QUERIES.items():
        df = fn(spark, SF_CORRECT)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
