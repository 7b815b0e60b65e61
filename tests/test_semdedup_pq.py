"""Quality gates for the SemDeDup prune lane and the PQ-ADC ANN lane
(similarity.py) — properties the hash-equality oracle cannot express:
the prune rule's survivor guarantees against an independent numpy
recomputation, and ADC-shortlist recall against exact brute force.
"""

from __future__ import annotations

import os

import numpy as np

from sf_etl_spark.queries import all_queries
from sf_etl_spark.queries.similarity import PQ_RERANK, SEM_EPS, SEM_K

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


def _cosine_matrix(v):
    nm = np.linalg.norm(v, axis=1)
    return (v @ v.T) / np.outer(nm, nm)


def test_semdedup_prune_matches_numpy_recomputation(spark):
    """Independent full recomputation of assignment + prune rule."""
    ids, v = _embeddings(spark)
    cos = _cosine_matrix(v)
    idx = {int(i): k for k, i in enumerate(ids)}

    # seed-cell assignment: nearest of vec_id 1..SEM_K by cosine,
    # tie-break lower centroid id
    cents = [idx[c] for c in range(1, SEM_K + 1)]
    cent_cos = cos[:, cents]  # n x K
    # argmax with ascending-cid tie-break == numpy argmax (first max)
    cid = cent_cos.argmax(axis=1)
    ccos = cent_cos[np.arange(len(ids)), cid]

    pruned = set()
    n = len(ids)
    for a in range(n):
        for b in range(a + 1, n):
            if cid[a] != cid[b] or cos[a, b] < SEM_EPS:
                continue
            loser = (
                a
                if (ccos[a] > ccos[b]) or (ccos[a] == ccos[b] and ids[a] > ids[b])
                else b
            )
            pruned.add(int(ids[loser]))

    got = {
        int(r["vec_id"]): (int(r["cid"]), int(r["pruned"]))
        for r in all_queries()["dedup_semdedup_prune"].fn(spark, SF_DIR).collect()
    }
    assert len(got) == n  # every corpus vector labeled exactly once
    for k in range(n):
        vid = int(ids[k])
        assert got[vid][0] == int(ids[cents[cid[k]]])
        assert got[vid][1] == (1 if vid in pruned else 0)


def test_semdedup_keeps_a_survivor_per_dup_group(spark):
    """The prune rule must never erase a whole duplicate group: every
    pruned vector has an UNPRUNED within-cell neighbor >= eps reachable
    through the dup graph (the per-group (cent_cos, vec_id)-minimum
    survives by construction)."""
    rows = all_queries()["dedup_semdedup_prune"].fn(spark, SF_DIR).collect()
    state = {int(r["vec_id"]): (int(r["cid"]), int(r["pruned"]), r["cent_cos"]) for r in rows}
    ids, v = _embeddings(spark)
    cos = _cosine_matrix(v)
    idx = {int(i): k for k, i in enumerate(ids)}
    any_pruned = False
    for vid, (cid, pr, _) in state.items():
        if not pr:
            continue
        any_pruned = True
        # walk the dup graph inside the cell: some reachable member
        # must be unpruned
        seen, frontier, ok = {vid}, [vid], False
        while frontier and not ok:
            cur = frontier.pop()
            for other, (ocid, opr, _) in state.items():
                if other in seen or ocid != cid:
                    continue
                if cos[idx[cur], idx[other]] >= SEM_EPS:
                    if not opr:
                        ok = True
                        break
                    seen.add(other)
                    frontier.append(other)
        assert ok, f"dup group of {vid} fully pruned"
    assert any_pruned, "fixture contains near-dups; none pruned => rule inert"


def test_pq_adc_rerank_recall_and_exactness(spark):
    """ADC shortlist + exact re-rank: returned cosines are the true
    cosines (re-rank is exact), and recall@10 vs brute force clears a
    floor a 128-entry codebook must reach on this corpus."""
    ids, v = _embeddings(spark)
    idx = {int(i): k for k, i in enumerate(ids)}
    nm = np.linalg.norm(v, axis=1)
    q = idx[0]
    cosines = (v @ v[q]) / (nm * nm[q])
    cosines[q] = -np.inf
    truth_order = np.lexsort((ids, -cosines))
    truth = {int(ids[k]) for k in truth_order[:10]}

    got = all_queries()["ann_pq_adc_topk"].fn(spark, SF_DIR).collect()
    assert len(got) == 10
    for r in got:
        k = idx[int(r["vec_id"])]
        assert abs(r["cosine"] - cosines[k]) < 1e-9  # exact re-rank
    recall = len({int(r["vec_id"]) for r in got} & truth) / 10
    # a PQ_RERANK-deep ADC shortlist must recover at least half the
    # true top-10 at fixture scale; brute force is the oracle lane
    assert recall >= 0.5, f"PQ recall@10 collapsed: {recall}"
    assert PQ_RERANK >= 10


def test_ivfpq_is_pq_restricted_to_probed_cells(spark):
    """The composed IVF-PQ lane must return vectors that (a) carry
    exact true cosines (re-rank exactness) and (b) all belong to the
    query's nprobe nearest seed cells — and its shortlist can only
    LOSE candidates vs the unpruned PQ lane, never invent new ADC
    distances (every returned (vec_id, adc_dist) must match the
    full-corpus PQ scoring bit-for-bit, recomputed here in numpy)."""
    from sf_etl_spark.queries.similarity import (
        IVF_K,
        IVF_NPROBE,
        PQ_C,
        PQ_M,
        PQ_SUBDIM,
    )

    ids, v = _embeddings(spark)
    idx = {int(i): k for k, i in enumerate(ids)}
    nm = np.linalg.norm(v, axis=1)
    q = idx[0]

    # seed-cell assignment + probe set (numpy recomputation)
    cents = [idx[c] for c in range(1, IVF_K + 1)]
    cc = (v @ v[cents].T) / np.outer(nm, nm[cents])
    cell = cc.argmax(axis=1)  # first-max == lowest-cid tie-break
    qc = cc[q]
    probe = set(np.lexsort((np.arange(IVF_K), -qc))[:IVF_NPROBE])

    # full PQ-ADC recomputation
    cw = np.stack(
        [
            np.stack(
                [v[idx[c]][m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM] for c in range(1, PQ_C + 1)]
            )
            for m in range(PQ_M)
        ]
    )  # (M, C, SUBDIM)
    qd2 = ((cw - v[q].reshape(PQ_M, PQ_SUBDIM)[:, None, :]) ** 2).sum(axis=2)  # (M, C)
    sub = v.reshape(len(ids), PQ_M, PQ_SUBDIM)
    d2 = ((sub[:, :, None, :] - cw[None]) ** 2).sum(axis=3)  # (n, M, C)
    codes = d2.argmin(axis=2)  # first-min == lowest-c tie-break
    adc = qd2[np.arange(PQ_M)[None, :], codes].sum(axis=1)

    got = all_queries()["ann_ivf_pq_topk"].fn(spark, SF_DIR).collect()
    assert 0 < len(got) <= 10
    cosines = (v @ v[q]) / (nm * nm[q])
    for r in got:
        k = idx[int(r["vec_id"])]
        assert int(cell[k]) in probe  # candidate really came from a probed cell
        assert abs(r["cosine"] - cosines[k]) < 1e-9  # exact re-rank
        # float-tolerant vs numpy (sum order differs); the bit-exact
        # gate vs the engine's own fold order is the DuckDB oracle
        assert abs(r["adc_dist"] - adc[k]) < 1e-9
