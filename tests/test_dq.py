"""Unit tests for the data-quality operators (operators/dq.py) with
fixtures that actually CONTAIN violations — the synthetic tables are
clean, so the registered report alone can't prove detection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sf_etl_spark.operators.dq import (
    column_rules_report,
    fk_orphan_count,
    uniqueness_violations,
)


@pytest.fixture(scope="module")
def dirty(spark):
    return spark.createDataFrame(
        [(1, 10.0, "A"), (2, -5.0, None), (2, 3.0, "B"), (4, None, "ZZZ")],
        "id bigint, bal double, seg string",
    )


def test_column_rules_one_scan(spark, dirty):
    report = column_rules_report(
        dirty,
        {
            "bal_negative": F.col("bal") < 0,
            "seg_null": F.col("seg").isNull(),
            "seg_unknown": ~F.col("seg").isin("A", "B"),  # null seg -> not a violation (3VL)
        },
    )
    rows = {r["rule"]: r["n_violations"] for r in report.collect()}
    assert rows == {"bal_negative": 1, "seg_null": 1, "seg_unknown": 1}
    # all row-level rules must ride a single scan of the input
    # (AQE prints final + initial plan; count only the final section)
    plan = report._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan ExistingRDD") + final.count("FileScan") <= 1


def test_uniqueness_violations(spark, dirty):
    (row,) = uniqueness_violations(dirty, ["id"], "id_dup").collect()
    assert row["rule"] == "id_dup" and row["n_violations"] == 1


def test_uniqueness_null_keys_never_conflict(spark):
    # SQL UNIQUE semantics: NULL keys don't conflict with anything —
    # one NULL row, or N of them, is 0 violations; and a NULL in ANY
    # column of a composite key exempts the row.
    df = spark.createDataFrame(
        [(None, "x"), (None, "y"), (1, "a"), (1, "a"), (2, None)],
        "k bigint, s string",
    )
    (row,) = uniqueness_violations(df, ["k"], "u").collect()
    assert row["n_violations"] == 1  # only the duplicated k=1 pair
    (row,) = uniqueness_violations(df, ["k", "s"], "u2").collect()
    assert row["n_violations"] == 1  # (2, NULL) exempt, (1,'a') dup


def test_fk_orphan_count(spark, dirty):
    parents = spark.createDataFrame([(1,), (2,)], "pid bigint")
    (row,) = fk_orphan_count(dirty, "id", parents, "pid", "fk_orphan").collect()
    assert row["rule"] == "fk_orphan" and row["n_violations"] == 1  # id=4

    empty_violation = column_rules_report(dirty.limit(0), {"any": F.lit(True)}).collect()
    assert empty_violation[0]["n_violations"] == 0  # sum over empty -> 0, not null


def test_connected_components_chain_and_singletons(spark):
    from sf_etl_spark.operators.graph import connected_components

    # chain 1-2-3-4 (diameter 3, needs multiple propagation rounds),
    # pair 10-11, singleton 20
    verts = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 20]], "vertex bigint")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src bigint, dst bigint"
    )
    got = {r["vertex"]: r["component"] for r in connected_components(verts, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_random_graphs_vs_union_find(spark):
    """Property check: min-label propagation == union-find ground truth
    on randomized (seeded) graphs, including multi-cluster + isolated
    vertices and diameters larger than one round."""
    import random

    from sf_etl_spark.operators.graph import connected_components

    rng = random.Random(42)
    for trial in range(3):
        n = 40
        verts = list(range(n))
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(10, 35))
        ]
        edges = [(a, b) for a, b in edges if a != b]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {v: find(v) for v in verts}
        # canonicalize to min member per component
        comp_min = {}
        for v in verts:
            r = find(v)
            comp_min[r] = min(comp_min.get(r, v), v)
        want = {v: comp_min[find(v)] for v in verts}

        vdf = spark.createDataFrame([(v,) for v in verts], "vertex bigint")
        edf = spark.createDataFrame(edges or [(0, 0)], "src bigint, dst bigint")
        got = {
            r["vertex"]: r["component"]
            for r in connected_components(vdf, edf).collect()
        }
        assert got == want, f"trial {trial}"
