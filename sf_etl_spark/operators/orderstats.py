"""Exact distributed order statistics — k-th smallest without a
global sort.

KLL (queries/sketches.py) answers quantiles approximately from a
mergeable summary; this operator answers them EXACTLY, the way a
massively-parallel engine does it: iterative histogram narrowing
(the classic distributed selection algorithm — Blum et al.'s
selection bound meets MapReduce; same scheme BigQuery/Presto use for
exact percentile on demand).

Per round: ONE scan of the current scope builds an equi-width
integer histogram (a partial-aggregated groupBy — B counts, B
bounded, shuffled as B rows); the driver walks the prefix sums (B
integers — bounded metadata, the connected_components scalar policy)
and narrows the scope to the single bucket containing rank k. The
value range shrinks ×B per round, so ⌈log_B(range)⌉ rounds bound the
loop (3 rounds cover any int64 range at B=4096); the final in-bucket
step is a TakeOrdered of the remaining rank — never a global sort of
n rows.

At 100 TB: each round is a full scan (cheap, pushed filters narrow
it progressively) + B-row shuffle; driver traffic is O(B·rounds)
integers. Contrast: ``ORDER BY x LIMIT 1 OFFSET k`` plans a global
sort; ``percentile_approx`` gives error bars. This is the
exact-and-scalable third option.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kth_smallest(
    df: DataFrame,
    col: str,
    k: int,
    n_buckets: int = 1024,
    max_rounds: int = 8,
) -> int:
    """Exact k-th smallest (1-based) of an integer column, by
    iterative histogram narrowing. Returns the value as a Python int
    (a bounded scalar — the caller re-enters it as a literal/1-row
    frame, the same policy as pagerank's n_nodes)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    c = F.col(col)
    bounds = df.agg(F.min(c).alias("lo"), F.max(c).alias("hi")).first()
    lo, hi = bounds["lo"], bounds["hi"]
    if lo is None:
        raise ValueError(f"kth_smallest on all-null column {col!r}")
    scope = df
    remaining = k
    for _ in range(max_rounds):
        if lo == hi:
            return int(lo)
        span = hi - lo + 1
        width = -(-span // n_buckets)  # ceil; >= 1
        # bucket index in EXACT decimal arithmetic: the double-divide
        # form ((c-lo)/width).cast(long) disagrees with the integer
        # narrowing filter once values exceed 2^53 (a boundary value
        # can round into the neighboring bucket), and c - lo itself
        # can wrap int64 when lo < 0 with a 2^63-wide span. DECIMAL(38)
        # holds any int64 difference exactly, and (a - a mod w) / w is
        # an exact integral quotient.
        a = c.cast("decimal(38,0)") - F.lit(lo).cast("decimal(38,0)")
        b = (a - F.pmod(a, F.lit(width))) / F.lit(width)
        hist = (
            scope.groupBy(b.cast("long").alias("b"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()  # <= n_buckets rows: bounded metadata
        )
        counts = {int(r["b"]): int(r["n"]) for r in hist}
        cum = 0
        for b in sorted(counts):
            if cum + counts[b] >= remaining:
                remaining -= cum
                lo2 = lo + b * width
                hi2 = min(hi, lo2 + width - 1)
                scope = scope.filter(c.between(F.lit(lo2), F.lit(hi2)))
                lo, hi = lo2, hi2
                break
            cum += counts[b]
        else:  # k exceeds row count
            raise ValueError(f"k={k} exceeds non-null rows of {col!r}")
    # range did not collapse within max_rounds (pathological spread):
    # the scope is a single bucket of the last round — finish with a
    # TakeOrdered of the remaining rank, never a global sort.
    row = (
        scope.orderBy(c)
        .limit(remaining)
        .agg(F.max(c).alias("v"))
        .first()
    )
    return int(row["v"])


def exact_median(df: DataFrame, col: str) -> tuple[int, int, int]:
    """Exact median helpers: returns (n, v_at_k1, v_at_k2) where
    k1/k2 are the middle rank(s) — equal for odd n. The caller forms
    the midpoint; both probes share the narrowing machinery."""
    n = df.filter(F.col(col).isNotNull()).count()
    if n == 0:
        raise ValueError("exact_median of empty input")
    if n % 2 == 1:
        k1 = k2 = (n + 1) // 2
        v1 = v2 = kth_smallest(df, col, k1)
    else:
        k1, k2 = n // 2, n // 2 + 1
        v1 = kth_smallest(df, col, k1)
        v2 = kth_smallest(df, col, k2)
    return n, v1, v2
