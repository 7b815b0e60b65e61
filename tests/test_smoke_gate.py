"""Pre-snapshot smoke gate: construct EVERY registered query's
DataFrame against sf0.001 and force analysis, without executing it.

Round 3 shipped two regressions a plan-time check would have caught in
under a minute (a NameError in the SOQL compiler and an
AnalysisException in the events loader); this gate exists so a
half-finished refactor can never reach a snapshot commit silently
again. Run it before any commit touching `sf_etl_spark/`:

    python -m pytest tests/test_smoke_gate.py -q

Plan construction + `df.schema` drives Catalyst analysis (column
resolution, type checking, UDF registration) but no jobs, so the whole
gate is seconds, not minutes. The full oracle suite
(`test_queries_oracle.py`) remains the correctness authority.
"""

from __future__ import annotations

import pytest

from sf_etl_spark.queries import all_queries
from sf_etl_spark.sources import TABLES, load_table

SPECS = all_queries()


@pytest.mark.parametrize("table", sorted(TABLES))
def test_table_loads(spark, sf_dir, table):
    df = load_table(spark, sf_dir, table)
    assert df.columns


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_plan_analyzes(spark, sf_dir, name):
    df = SPECS[name].fn(spark, sf_dir)
    assert df.schema.fields  # forces analysis; no execution
