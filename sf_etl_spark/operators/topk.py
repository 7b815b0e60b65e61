"""Lossless two-phase (salted) top-k per group.

The naive ``row_number() OVER (PARTITION BY g ORDER BY ...) <= k``
plans ONE sort task per distinct ``g`` — constant parallelism when
|g| is small (5 market segments, 5 eval queries) while the input
grows with the data: the exact defect class the window-quarantine
guard (tests/test_plans.py) exists to catch.

This operator is the repo's standard replacement (the
``topk_per_group`` lane documents the argument inline):

Phase 1 ranks within ``(group, salt)`` — ``n_salts`` deterministic
hash salts → |g|·n_salts parallel sorts of n/(|g|·n_salts) rows —
and cuts at k. The cut is LOSSLESS for any salt assignment: a row in
the global top-k of its group beats at most k−1 rows overall, hence
at most k−1 within its own salt bucket, so its local rank is ≤ k.
Phase 2 ranks the ≤ k·n_salts survivors per group — a bounded frame
(post-cut in the guard's audit taxonomy; lanes using this operator
still carry an allowlist entry naming that bound).

Ranks returned are exact for the top-k rows (phase-2 rank over
survivors equals global rank whenever global rank ≤ k); rows beyond
k are dropped.

At 100 TB: phase 1 is one shuffle on (group, salt) with full-width
parallelism; phase 2 shuffles only k·n_salts rows per group.

Reference parity: nater540/sf-etl has no ranking operators at all
(extract-only client); this is north-star surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SALTS = 64


def salted_topk(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    salt_on: Sequence[str],
    n_salts: int = DEFAULT_SALTS,
    rank_col: str | None = None,
) -> DataFrame:
    """Exact top-k rows per group, two-phase salted rank.

    ``order_cols`` must be a deterministic total order within each
    group (include a tie-break column) — otherwise "top k" is not
    well-defined and engines may disagree. ``salt_on`` names the
    column(s) hashed into the salt; use a high-cardinality key so the
    salt buckets balance. If ``rank_col`` is given, the exact global
    rank (1..k) is kept under that name.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not partition_cols:
        raise ValueError("partition_cols must be non-empty (for a global "
                         "top-k use TakeOrdered via df.orderBy().limit())")
    clobbered = {"_salt", "_lrn", "_grn"} & set(df.columns)
    if clobbered:
        # withColumn silently REPLACES same-named columns — a caller's
        # _salt would be overwritten and then dropped with no error
        raise ValueError(
            f"salted_topk reserves temp column names {sorted(clobbered)}; "
            "rename them in the input DataFrame first"
        )
    salt = F.pmod(F.hash(*salt_on), F.lit(n_salts))
    w_local = Window.partitionBy(*partition_cols, "_salt").orderBy(*order_cols)
    surv = (
        df.withColumn("_salt", salt)
        .withColumn("_lrn", F.row_number().over(w_local))
        .filter(F.col("_lrn") <= k)  # lossless: survivors ≤ k·n_salts/group
    )
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    out = (
        surv.withColumn("_grn", F.row_number().over(w))
        .filter(F.col("_grn") <= k)
        .drop("_salt", "_lrn")
    )
    if rank_col is None:
        return out.drop("_grn")
    return out.withColumnRenamed("_grn", rank_col)
