"""Sorted-neighborhood candidate generation: correctness of the
window semantics and the LINEAR candidate-growth bound that fixes the
r5-flagged fixed-cardinality-blocking caveat (within-block all-pairs
grows O(n²/B) with a closed blocking vocabulary; the window bounds
candidates to n·W regardless of B)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sf_etl_spark.operators.linkage import sorted_neighborhood_pairs


def _names_df(spark, n: int):
    """n synthetic names over a FIXED first-token vocabulary (8
    tokens) — the adversarial case for naive blocking: block count
    stays constant while block population grows with n."""
    tokens = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "kappa", "zeta"]
    return spark.range(n).select(
        F.col("id").alias("rec_id"),
        F.concat_ws(
            " ",
            F.element_at(
                F.array(*[F.lit(t) for t in tokens]), (F.col("id") % 8 + 1).cast("int")
            ),
            F.format_string("item%04d", (F.col("id") * 37 % 997).cast("int")),
        ).alias("name"),
    )


def test_window_semantics_match_bruteforce(spark):
    """Candidates = exactly the pairs within W positions of each other
    in per-block (name, rec_id) order — brute-force checked."""
    df = _names_df(spark, 60).withColumn(
        "blk", F.split("name", " ").getItem(0)
    )
    w = 3
    got = {
        (r.a_rec_id, r.b_rec_id)
        for r in sorted_neighborhood_pairs(
            df, "blk", ["name", "rec_id"], window=w, payload_cols=["rec_id"]
        ).collect()
    }
    rows = df.select("blk", "name", "rec_id").collect()
    by_blk: dict[str, list] = {}
    for r in rows:
        by_blk.setdefault(r.blk, []).append((r.name, r.rec_id))
    want = set()
    for members in by_blk.values():
        members.sort()
        for i, (_, a) in enumerate(members):
            for _, b in members[i + 1 : i + 1 + w]:
                want.add((a, b))
    assert got == want


def test_candidate_growth_is_linear_not_quadratic(spark):
    """10× rows under a FIXED blocking vocabulary → ~10× candidates.

    The pre-r6 all-pairs blocking would produce ~100× here (pairs
    ∝ n²/B with constant B); the sorted-neighborhood bound is n·W.
    Tolerance 12× covers edge effects at block boundaries."""
    w = 8
    small = sorted_neighborhood_pairs(
        _names_df(spark, 400).withColumn("blk", F.split("name", " ").getItem(0)),
        "blk",
        ["name", "rec_id"],
        window=w,
        payload_cols=["rec_id"],
    ).count()
    big = sorted_neighborhood_pairs(
        _names_df(spark, 4000).withColumn("blk", F.split("name", " ").getItem(0)),
        "blk",
        ["name", "rec_id"],
        window=w,
        payload_cols=["rec_id"],
    ).count()
    assert small > 0
    assert big <= 12 * small  # linear, not the ~100× of all-pairs
    assert big <= 4000 * w  # the hard n·W bound


def test_pair_count_never_exceeds_n_times_w(spark):
    """The n·W hard bound holds even when one block holds everything
    (worst-case skew: single blocking key)."""
    df = _names_df(spark, 500).withColumn("blk", F.lit("one"))
    w = 5
    n_pairs = sorted_neighborhood_pairs(
        df, "blk", ["name", "rec_id"], window=w, payload_cols=["rec_id"]
    ).count()
    assert n_pairs == (500 - 1 + 500 - 2 + 500 - 3 + 500 - 4 + 500 - 5)
