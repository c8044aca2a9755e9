from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineer_development_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield s


def fresh_db(spark, name: str) -> str:
    """Drop-and-recreate a test database, including any orphaned warehouse
    directory a previously-killed run left behind (the fresh in-memory
    metastore doesn't know about those, so saveAsTable would fail with
    LOCATION_ALREADY_EXISTS)."""
    import shutil

    spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(wh, f"{name}.db"), ignore_errors=True)
    spark.sql(f"CREATE DATABASE {name}")
    return name
