"""Trained IVF-PQ quality gate (r12 verdict task 4).

The registered `ann_ivf_pq_trained_agreement` lane proves the trained
composition's INTEGRITY (lossless parameters ⇒ brute-force-equal
output, hash-checked against the DuckDB oracle by test_queries_oracle
and the driver). This file gates QUALITY at real operating points:
with actual cell pruning and the ADC shortlist cut, the trained
quantizers (k-means coarse + grouped-Lloyd PQ codebooks) must reach at
least the seed-selection quantizers' recall@10 at the same probe
fraction — trained centroids follow data density, seed centroids are
arbitrary corpus rows, and the Lloyd fit is initialized FROM the seed
codebook so each iteration can only reduce quantization distortion.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_trained_ivf_pq_recall_beats_or_matches_seeded(spark):
    from sf_etl_spark.queries.similarity import (
        IVF_K,
        IVF_KM_K,
        IVF_KM_NPROBE,
        IVF_NPROBE,
        _ivf_pq_recall,
        _kmeans_centers,
        _pq_codebook,
        _pq_train_codebooks,
        normalized_vectors,
    )

    # same probe fraction on both sides: 2/8 == 4/16
    assert IVF_NPROBE / IVF_K == IVF_KM_NPROBE / IVF_KM_K

    n = normalized_vectors(spark, SF_DIR)
    seeded_cents = n.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= IVF_K)
    ).select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    seeded = _ivf_pq_recall(
        spark, n, seeded_cents, _pq_codebook(spark, n), IVF_NPROBE
    ).collect()

    _, trained_cents = _kmeans_centers(spark, n)
    trained_cb = _pq_train_codebooks(spark, n)
    trained = _ivf_pq_recall(
        spark, n, trained_cents, trained_cb, IVF_KM_NPROBE
    ).collect()

    assert [r["query_id"] for r in seeded] == [r["query_id"] for r in trained]
    seeded_mean = sum(r["recall_at_10"] for r in seeded) / len(seeded)
    trained_mean = sum(r["recall_at_10"] for r in trained) / len(trained)
    assert trained_mean >= seeded_mean
    assert trained_mean > 0  # the trained path must actually find neighbors


def test_trained_pq_codebooks_cut_distortion(spark):
    """Each Lloyd iteration minimizes within-codeword distortion; the
    trained codebooks' total encode distortion must be strictly below
    the seed codebooks' (they refine the SAME init on the same data)."""
    from sf_etl_spark.queries.similarity import (
        PQ_SUBDIM,
        _pq_codebook,
        _pq_train_codebooks,
        normalized_vectors,
    )

    n = normalized_vectors(spark, SF_DIR)

    def distortion(cb):
        d2 = F.aggregate(
            F.zip_with(
                F.expr(f"slice(v, m * {PQ_SUBDIM} + 1, {PQ_SUBDIM})"),
                F.col("w"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )
        per = (
            n.select("vec_id", "v")
            .crossJoin(F.broadcast(cb))
            .groupBy("vec_id", "m")
            .agg(F.min(d2).alias("best"))
        )
        return per.agg(F.sum("best")).collect()[0][0]

    seed = distortion(_pq_codebook(spark, n))
    trained = distortion(_pq_train_codebooks(spark, n))
    assert trained < seed
