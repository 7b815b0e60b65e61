"""SimHash candidate blocking must have recall 1.0.

The pair-key scheme (8 blocks, C(8,2)=28 two-block keys) guarantees
every hamming≤6 pair matches at least one key: ≤6 differing bits can
touch at most 6 of the 8 blocks, leaving ≥2 clean blocks whose pair
key matches. This test checks the guarantee empirically against the
exact O(n²) hamming self-join on the fixture, plus a synthetic
adversarial corpus whose differing bits spread across many blocks
(the case that breaks any single-block scheme, including r1's
top-16-bit prefix blocking and the unsound "4 blocks, match any one").
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sf_etl_spark.queries.llm import (
    SIMHASH_MAX_HAMMING,
    simhash_candidates,
    simhash_fingerprints,
)
from sf_etl_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _exact_pairs(spark, fps):
    a, b = fps.alias("a"), fps.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(hamming <= SIMHASH_MAX_HAMMING)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
    )


def _as_set(df):
    return {(r["doc_a"], r["doc_b"], r["hamming"]) for r in df.collect()}


def test_recall_is_exact_on_fixture(spark):
    fps = simhash_fingerprints(load_table(spark, SF_DIR, "documents")).cache()
    got = _as_set(simhash_candidates(fps))
    want = _as_set(_exact_pairs(spark, fps))
    fps.unpersist()
    assert got == want  # complete (recall 1.0) AND precise (filter applied)


def test_recall_on_adversarial_bit_spreads(spark):
    """Pairs at hamming exactly 6 with bits spread 2+2+1+1 over four
    16-bit quarters — constructed to defeat 4-block any-one matching —
    plus spreads hitting 6 distinct 8-bit blocks (worst case for the
    pair-key scheme: exactly 2 clean blocks remain)."""
    base = 0x0123_4567_89AB_CDEF
    flips = [
        0,  # identical twin: hamming 0
        (1 << 0) | (1 << 1) | (1 << 16) | (1 << 17) | (1 << 32) | (1 << 48),
        (1 << 5) | (1 << 13) | (1 << 21) | (1 << 29) | (1 << 37) | (1 << 45),
        (1 << 7) | (1 << 15) | (1 << 23) | (1 << 31) | (1 << 39) | (1 << 63),
        0x7F,  # 7 bits: just OVER the threshold — must not appear
    ]

    def signed(x):
        return x - (1 << 64) if x >= (1 << 63) else x

    rows = [(i, signed(base ^ f)) for i, f in enumerate(flips)]
    fps = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = _as_set(simhash_candidates(fps))
    want = _as_set(_exact_pairs(spark, fps))
    assert got == want
    # sanity: the hamming-6 adversarial pairs ARE in the result...
    assert {(0, 1), (0, 2), (0, 3)} <= {(a, b) for a, b, _ in got}
    # ...and the hamming-7 pair is not
    assert (0, 4) not in {(a, b) for a, b, _ in got}
