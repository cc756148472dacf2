"""Shared fixtures: one local SparkSession per test run, DuckDB oracle."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_imdb_classifier_spark.session import get_spark  # noqa: E402
from big_data_imdb_classifier_spark.sources.schemas import TABLE_NAMES  # noqa: E402

TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = os.path.join(TESTDATA_ROOT, "sf0.001")
SF_ORACLE = os.path.join(TESTDATA_ROOT, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the testdata tables registered as views,
    mirroring the driver's oracle environment (sf0.01)."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(SF_ORACLE, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_smoke():
    """Same oracle views at sf0.001 for fast per-operator checks."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(SF_SMOKE, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()
