"""Every registered query with an oracle must match DuckDB exactly;
rows-only queries must at least execute and return a stable schema."""

from __future__ import annotations

import pytest

from sf_etl_spark.queries import all_queries
from tests.oracle_compare import compare_query

SPECS = all_queries()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, oracle, sf_dir, name):
    spec = SPECS[name]
    compare_query(spark, oracle, spec.fn, spec.oracle, sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df.columns  # stable schema
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as ent

    df = ent.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"n_name", "revenue"}


def test_registry_contract(spark):
    import __spark_entry__ as ent

    q = ent.queries()
    o = ent.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 25
