"""Record-linkage candidate generation with a BOUNDED candidate count.

The naive blocked self-join (everything-vs-everything within a
blocking key) is only sub-quadratic while the number of blocks grows
with the data. A blocking key with FIXED cardinality — first name
token, zip prefix, any closed vocabulary — silently degrades: block
population grows linearly with n, so within-block pairs grow
O(n²/B) with constant B. That is exactly the r5-flagged weakness of
the first-token-blocked fuzzy matcher.

``sorted_neighborhood_pairs`` is the classic fix (Hernández & Stolfo,
"The merge/purge problem for large databases", SIGMOD 1995): sort each
block by a similarity-preserving key, then compare only rows within a
fixed window W of each other in that order. Candidates are ≤ n·W —
LINEAR in n regardless of blocking-key cardinality — and near-
duplicate strings sort adjacently, so recall stays high for the
edit-distance-close pairs the verify stage scores.

Join shape: the window join is expressed as an explode-to-equi-join —
each left row fans out to its W forward offsets, then one hash
equi-join on (block, rank). No range residual, no per-block nested
loop: the shuffle is W× a slim (block, rank, key) projection, and the
physical plan is the same partial-agg-friendly hash join every other
lane uses. At 100 TB this is the shape that survives: cost is
O(n·W) comparisons and one window + one equi-join shuffle, however
skewed the blocking vocabulary is.

Reference parity: nater540/sf-etl has no linkage surface (the Rust
core is an HTTP client + DDL generator); this module is north-star
training-data-pipeline surface per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sorted_neighborhood_pairs(
    df: DataFrame,
    block_col: str | Column,
    order_cols: list[str],
    window: int = 8,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Candidate pairs within ``window`` positions of each other in
    per-block sorted order.

    Returns one row per ordered candidate pair with columns
    ``blk`` plus ``a_<c>`` / ``b_<c>`` for every payload column.
    Pair count is bounded by ``n_rows * window`` by construction —
    the property test blows the input up 10× and asserts the
    candidate count scales ~10×, not 100×.

    ``order_cols`` must be a total order (include a tiebreak key) so
    ranks — and therefore the candidate set — are deterministic and
    an ANSI-SQL oracle can replay them.
    """
    payload = payload_cols if payload_cols is not None else list(df.columns)
    blk = F.col(block_col) if isinstance(block_col, str) else block_col
    ranked = df.select(
        blk.alias("blk"),
        F.row_number()
        .over(Window.partitionBy(blk).orderBy(*[F.col(c) for c in order_cols]))
        .alias("rn"),
        *payload,
    )
    left = ranked.select(
        "blk",
        "rn",
        F.explode(F.sequence(F.col("rn") + 1, F.col("rn") + window)).alias("rn_b"),
        *[F.col(c).alias(f"a_{c}") for c in payload],
    )
    right = ranked.select(
        "blk",
        F.col("rn").alias("rn_b"),
        *[F.col(c).alias(f"b_{c}") for c in payload],
    )
    # pure equi-join on (blk, rn_b): offsets past the block's last
    # rank simply find no partner and drop out of the inner join
    return left.join(right, ["blk", "rn_b"]).drop("rn", "rn_b")
