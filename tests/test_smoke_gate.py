"""Pre-snapshot smoke gate: construct EVERY registered query's
DataFrame against sf0.001 and force analysis.

Round 3 shipped two regressions a plan-time check would have caught in
under a minute (a NameError in the SOQL compiler and an
AnalysisException in the events loader); this gate exists so a
half-finished refactor can never reach a snapshot commit silently
again. Run it before any commit touching `sf_etl_spark/`:

    python -m pytest tests/test_smoke_gate.py -q

For most lanes, plan construction + `df.schema` drives Catalyst
analysis (column resolution, type checking, UDF registration) but no
jobs. The exceptions are the EXECUTE_ON_CONSTRUCT lanes below: their
fn() performs real merges/writes at DataFrame-construction time
(returning a read-back of the written target), so the gate runs real
jobs — and leaves tempdirs — for exactly those names. That is the
price of gating them at all; the list keeps the cost visible and lets
`-m "not smoke_exec"` skip them for a sub-minute pure-analysis pass.
The full oracle suite (`test_queries_oracle.py`) remains the
correctness authority.
"""

from __future__ import annotations

import pytest

from sf_etl_spark.queries import all_queries
from sf_etl_spark.sources import TABLES, load_table

SPECS = all_queries()

#: Lanes whose fn() executes real Spark jobs during DataFrame
#: construction — either writes/merges (the returned df is a read-back
#: of a just-written target) or eager computation (bloom collect,
#: KMeans training, iterative localCheckpoints). The gate runs real
#: jobs for exactly these; `-m "not smoke_exec"` is the pure-analysis
#: pass.
EXECUTE_ON_CONSTRUCT = {
    # write-side lanes (merges/writes at construct)
    "sink_merge_cdc",
    "merge_time_travel",
    "merge_change_feed",
    "dedup_incremental_ingest",
    "dpp_partitioned_join",
    "scd2_point_in_time_join",
    "zorder_roundtrip",
    "scd2_dimension_history",
    "rollup_incremental_maintenance",
    "dq_observe_inflight",
    "bucketed_join_colocated",
    "sink_roundtrip_partitioned",
    "source_csv_roundtrip",
    "source_orc_roundtrip",
    "source_json_roundtrip",
    "source_schema_evolution",
    # job-executing (non-writing) lanes: eager collect / ML fit /
    # localCheckpoint at DataFrame-construction time
    "bloom_semi_join_revenue",      # bloom bitmap collect()
    "pagerank_topk",                # edge/rank localCheckpoints
    "ann_ivf_kmeans_topk",          # pyspark.ml KMeans.fit
    "ann_ivf_kmeans_agreement",     # pyspark.ml KMeans.fit
    "dedup_cluster_components",     # iterative label propagation
    "dedup_cluster_bigstar",        # iterative star contraction
}


@pytest.mark.parametrize("table", sorted(TABLES))
def test_table_loads(spark, sf_dir, table):
    df = load_table(spark, sf_dir, table)
    assert df.columns


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.smoke_exec)
        if n in EXECUTE_ON_CONSTRUCT
        else n
        for n in sorted(SPECS)
    ],
)
def test_query_plan_analyzes(spark, sf_dir, name):
    df = SPECS[name].fn(spark, sf_dir)
    # forces analysis; executes jobs only for EXECUTE_ON_CONSTRUCT lanes
    assert df.schema.fields
