"""Quality gates for the binary-quantization ANN lanes (similarity.py)
— properties the hash-equality oracle cannot express: the sign-bit
pack against an independent numpy recomputation, shortlist recall
against exact brute force, and the no-global-sort plan shape.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import functions as F

from sf_etl_spark.queries import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _embeddings(spark):
    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    v = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], v[order]


def test_binary_pack_matches_numpy(spark):
    """The engine's two-BIGINT sign-bit pack must equal an independent
    numpy bit pack (LSB-first within each 32-bit half)."""
    from sf_etl_spark.queries.similarity import _bq_pack, normalized_vectors

    ids, v = _embeddings(spark)
    bits = (v > 0).astype(np.int64)
    want_b1 = (bits[:, :32] << np.arange(32)).sum(axis=1)
    want_b2 = (bits[:, 32:64] << np.arange(32)).sum(axis=1)
    got = {
        r["vec_id"]: (r["b1"], r["b2"])
        for r in normalized_vectors(spark, SF_DIR)
        .select("vec_id", *_bq_pack("v"))
        .collect()
    }
    for k, i in enumerate(ids):
        assert got[int(i)] == (int(want_b1[k]), int(want_b2[k])), int(i)


def test_binary_topk_recall_vs_brute_force(spark):
    """The Hamming-shortlist → exact-rerank top-10 must overlap the
    true cosine top-10 substantially, and every returned cosine must
    be the exact brute-force value for that id (the re-rank is exact
    math on the shortlist — only the candidate SET is approximate)."""
    from sf_etl_spark.queries.similarity import _QUERY_VEC

    ids, v = _embeddings(spark)
    nm = np.linalg.norm(v, axis=1)
    qi = int(np.where(ids == _QUERY_VEC)[0][0])
    cos = (v @ v[qi]) / (nm * nm[qi])
    cos[qi] = -np.inf  # exclude the query itself
    truth = set(ids[np.argsort(-cos)[:10]].tolist())

    got = all_queries()["ann_binary_hamming_topk"].fn(spark, SF_DIR).collect()
    assert len(got) == 10
    recall = len({r["vec_id"] for r in got} & truth) / 10
    assert recall >= 0.5, recall  # 64 sign bits must carry real signal
    by_id = {int(i): float(c) for i, c in zip(ids, (v @ v[qi]) / (nm * nm[qi]))}
    for r in got:
        assert abs(r["cosine"] - by_id[r["vec_id"]]) < 1e-12


def test_binary_topk_plan_has_no_global_sort(spark):
    """Both cuts must plan as TakeOrderedAndProject (per-partition
    partial top-k), never a global sort exchange; the only join
    against the corpus is the bounded 1-row/50-row broadcast."""
    df = all_queries()["ann_binary_hamming_topk"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
