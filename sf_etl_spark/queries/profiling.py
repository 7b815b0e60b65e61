"""Table profiling — the ANALYZE-style statistics collection every
warehouse runs before a cost-based optimizer (or a data-quality
dashboard) can do its job.

The reference generates DDL but never inspects data (SURVEY.md §2);
this lane adds the one-pass per-column profile: row count, non-null
count, exact NDV, and numeric min/max for every column of a table,
emitted long-form as one row per column.

Scale: the profile is ONE scan. Spark plans the six simultaneous
``count(DISTINCT col)`` aggregates with a single Expand (×7 row
multiplication) followed by two-phase partial aggregation — the
map-side partials collapse each expand-replica to its distinct keys
before the one shuffle, so the exchange carries per-column key sets,
not the multiplied rows. That is the classic exact-NDV cost at scale;
when even that is too hot, the HLL sketch rollup
(`queries/sketches.py:hll_rollup_merge`) is the sub-linear
alternative — the two lanes are deliberate companions.

Output-parity notes: min/max are emitted for NUMERIC columns only and
cast to double (string/timestamp extremes render differently across
engines — trailing-zero and fractional-second formatting — so they
stay out of the hashed surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sf_etl_spark.queries import register
from sf_etl_spark.sources import load_table

# (column, numeric?) — orders' full schema, the profile target.
_COLS: list[tuple[str, bool]] = [
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderdate", False),
    ("o_orderpriority", False),
]


def _oracle() -> str:
    parts = []
    for col, numeric in _COLS:
        mn = f"CAST(min({col}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        mx = f"CAST(max({col}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        parts.append(
            f"""SELECT '{col}' AS column_name,
                   (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_rows,
                   CAST(count({col}) AS BIGINT) AS n_nonnull,
                   CAST(count(DISTINCT {col}) AS BIGINT) AS ndv,
                   {mn} AS min_num,
                   {mx} AS max_num
            FROM orders"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY column_name"


@register(
    "column_profile",
    _oracle(),
    doc="one-pass ANALYZE-style profile of orders: nulls/NDV/min/max per column",
)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, numeric in _COLS:
        aggs.append(F.count(col).alias(f"nn_{col}"))
        aggs.append(F.countDistinct(col).alias(f"ndv_{col}"))
        if numeric:
            aggs.append(F.min(col).cast("double").alias(f"min_{col}"))
            aggs.append(F.max(col).cast("double").alias(f"max_{col}"))
    prof = o.agg(*aggs)

    # Long-form pivot of the single stats row: stack is a zero-shuffle
    # Expand over ONE row — the wide->long reshape costs nothing.
    stack_args: list[str] = []
    for col, numeric in _COLS:
        mn = f"min_{col}" if numeric else "CAST(NULL AS DOUBLE)"
        mx = f"max_{col}" if numeric else "CAST(NULL AS DOUBLE)"
        stack_args.append(f"'{col}', nn_{col}, ndv_{col}, {mn}, {mx}")
    stacked = prof.selectExpr(
        "n_rows",
        f"stack({len(_COLS)}, {', '.join(stack_args)}) "
        "AS (column_name, n_nonnull, ndv, min_num, max_num)",
    )
    return stacked.select(
        "column_name", "n_rows", "n_nonnull", "ndv", "min_num", "max_num"
    ).orderBy("column_name")
