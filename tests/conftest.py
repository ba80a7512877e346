"""Shared fixtures: one SparkSession and one DuckDB oracle per test run."""

from __future__ import annotations

import os

import duckdb
import pytest

from projectmapreduce_spark.io import TABLES
from projectmapreduce_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"
SF_BENCH = "/root/testdata/sf0.1"


def register_views(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    """Register the same 10 views the driver registers (__spark_entry__.py)."""
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


@pytest.fixture(scope="session")
def spark():
    return get_spark(app_name="pmr-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))


@pytest.fixture(scope="session")
def duck_correct():
    """DuckDB connection with views over the sf0.01 (correctness) tier."""
    con = duckdb.connect()
    register_views(con, SF_CORRECT)
    yield con
    con.close()
