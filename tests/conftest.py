"""Shared fixtures: one SparkSession + one DuckDB oracle per test run."""

from __future__ import annotations

import os

import duckdb
import pytest

from sf_etl_spark.session import get_spark
from sf_etl_spark.sources import TABLES

# Tests default to the smallest SF for speed; override with env var.
TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sf_etl_spark-tests", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR


@pytest.fixture(scope="session")
def oracle(sf_dir):
    """DuckDB connection with every table registered as a view —
    mirrors the driver's correctness-gate setup."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    yield con
    con.close()
