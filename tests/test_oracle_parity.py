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


def test_fixture_embedding_dims_match_pinned_constants():
    """VERDICT r9 #5: the inference model (_MODEL_DIMS) and the similarity
    family (DIMS) both pin 64 dims, and their oracles' size-guard/dims
    filters assume the FIXTURE is 64-wide. If the testdata is ever
    regenerated with a different width, fail loudly here instead of
    letting oracle LEFT-JOIN guards silently mask a family-wide drift."""
    import duckdb

    from data_engineer_development_spark.queries.corpus_ops import _MODEL_DIMS
    from data_engineer_development_spark.queries.similarity import DIMS

    assert _MODEL_DIMS == DIMS == 64
    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01"):
        n_off, n_all = con.execute(
            f"SELECT COUNT(*) FILTER (len(embedding) <> {DIMS}), COUNT(*) "
            f"FROM read_parquet('/root/testdata/{sf}/embeddings.parquet')"
        ).fetchone()
        assert n_all > 0, f"{sf}: empty embeddings fixture"
        assert n_off == 0, (
            f"{sf}: {n_off}/{n_all} embeddings are not {DIMS}-dim — the "
            "pinned model/similarity dims no longer match the fixture"
        )


def test_fixed_width_oracles_pin_membership():
    """Mechanizes the mixed-width discipline: any oracle that indexes
    embeddings at FIXED positions (generate_series(1, d) / embedding[d])
    silently TRUNCATES longer vectors and NULLs-out shorter ones, where
    Spark's zip_with/aggregate fold over each array's own length — so such
    an oracle MUST pin participation with a len(embedding) = d predicate
    (per-element list_transform oracles are width-agnostic and exempt).
    A new fixed-width oracle without a pin is a latent cross-engine
    membership divergence on any mixed-width corpus — fail here first."""
    import re

    import __spark_entry__ as e

    fixed_idx = re.compile(r"generate_series\(1,\s*\d+|embedding\[\s*\d")
    pin = re.compile(r"len\([a-z0-9_.]*embedding\)\s*=\s*\d+")
    unpinned = [
        name
        for name, sql in e.oracle_sql().items()
        if fixed_idx.search(sql) and not pin.search(sql)
    ]
    assert not unpinned, (
        "fixed-width-indexing oracles without a len(embedding) pin "
        f"(membership diverges on mixed-width corpora): {unpinned}"
    )
