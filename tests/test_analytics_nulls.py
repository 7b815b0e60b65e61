"""Null-key behavior of the ranked-analytics lanes.

The verdict-r9 item: `decile_lift_table` used to count rows including
null `c_acctbal` while `rank_cutpoints` drops null keys, and the
decile-assignment expression sent null keys to decile 1 while the
oracle's `ntile ... ORDER BY c_acctbal DESC` is NULLS LAST. Both
halves are now fixed by coalescing null balances to a data-derived
sentinel (max real negated-cents key + 1, so it sorts after every
real key WITHOUT stretching the key span past the BIGINT fast-path
guard the way LONG_MAX did — r10 ADVICE). This test runs
the lane against a fixture variant with ~8% null balances and
compares it to the DuckDB oracle — the same gate the driver runs.
"""

from __future__ import annotations

import shutil

import duckdb
import pytest

from sf_etl_spark.queries import all_queries
from tests.oracle_compare import compare_query

from tests.conftest import TEST_SF_DIR


@pytest.fixture(scope="module")
def null_acctbal_dir(tmp_path_factory):
    """sf0.001 with every 13th customer's c_acctbal nulled."""
    d = tmp_path_factory.mktemp("null_acctbal_sf")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * REPLACE (
            CASE WHEN c_custkey % 13 = 0 THEN NULL ELSE c_acctbal END
            AS c_acctbal
          )
          FROM read_parquet('{TEST_SF_DIR}/customer.parquet')
        ) TO '{d}/customer.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    shutil.copy(f"{TEST_SF_DIR}/orders.parquet", f"{d}/orders.parquet")
    return str(d)


@pytest.fixture(scope="module")
def null_oracle(null_acctbal_dir):
    con = duckdb.connect()
    for name in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{null_acctbal_dir}/{name}.parquet')"
        )
    yield con
    con.close()


def test_fixture_has_nulls(null_oracle):
    n = null_oracle.execute(
        "SELECT count(*) FROM customer WHERE c_acctbal IS NULL"
    ).fetchone()[0]
    assert n > 0, "fixture variant must actually contain null balances"


def test_decile_lift_null_acctbal(spark, null_oracle, null_acctbal_dir):
    spec = all_queries()["decile_lift_table"]
    compare_query(spark, null_oracle, spec.fn, spec.oracle, null_acctbal_dir)
