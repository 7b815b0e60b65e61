"""Graph analytics over the relational fixture — link analysis on the
customer↔supplier interaction graph.

The reference has no graph surface (SURVEY.md §2: it is an ETL
client); this module extends the engine the same way the dedup
clustering (operators/graph.py connected components) does, with the
other classic iterative-graph workload: PageRank. The oracle replays
the EXACT power iteration in chained CTEs — possible because every
float op in the engine lane is order-deterministic (single IEEE
divides/multiplies per row, decimal-lane fan-in sums; see
operators/graph.py:pagerank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sf_etl_spark.queries import register
from sf_etl_spark.sources import load_table

_PR_ITERS = 3


def _pr_sql() -> str:
    """Chained-CTE replay of the 3-iteration power method, mirroring
    operators/graph.py:pagerank op for op (same parenthesization, same
    decimal lane)."""
    its = []
    prev = "pr0"
    for k in range(1, _PR_ITERS + 1):
        its.append(
            f"""sums{k} AS (
      SELECT e.dst AS node,
             CAST(CAST(sum(CAST(p.pr / d.outdeg AS DECIMAL(38,10))) AS VARCHAR)
                  AS DOUBLE) AS s
      FROM edges e
      JOIN {prev} p ON e.src = p.node
      JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    ), pr{k} AS (
      -- CAST(... AS DOUBLE) everywhere: DuckDB parses bare 0.85 as a
      -- DECIMAL literal, making (1.0 - 0.85) an EXACT 0.15 — one ulp
      -- off the engine's IEEE double subtraction (0.15000000000000002)
      SELECT node, ((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n_nodes)
                   + (CAST(0.85 AS DOUBLE) * s) AS pr
      FROM sums{k} CROSS JOIN n
    )"""
        )
        prev = f"pr{k}"
    chain = ", ".join(its)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS c,
                      's' || CAST(l.l_suppkey AS VARCHAR) AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ), deg AS (
      SELECT src, CAST(count(*) AS DOUBLE) AS outdeg FROM edges GROUP BY src
    ), n AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_nodes FROM deg
    ), pr0 AS (
      SELECT src AS node, 1.0 / n_nodes AS pr FROM deg CROSS JOIN n
    ), {chain},
    ranked AS (
      SELECT node, pr,
             CAST(row_number() OVER (ORDER BY pr DESC, node) AS INT) AS rank
      FROM {prev}
    )
    SELECT rank, node, pr FROM ranked WHERE rank <= 15 ORDER BY rank
    """


@register(
    "pagerank_topk",
    _pr_sql(),
    doc=f"PageRank ({_PR_ITERS} iterations, d=0.85) on the customer↔supplier graph, top 15",
)
def pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link analysis on the bipartite customer↔supplier graph (an edge
    per distinct (customer, supplier) trading pair, both orientations,
    so no dangling nodes). Identifies the most-central suppliers/
    customers — the influence/anchor-detection primitive.

    Scale: see operators/graph.py:pagerank — per iteration one
    stable-partitioned join + one partial-agged shuffle; the pair
    derivation is a single orders⋈lineitem equi-join with a distinct
    (partial-agged). Top-15 plans as TakeOrderedAndProject, never a
    global sort of the rank vector.
    """
    from sf_etl_spark.operators.graph import pagerank

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    ranks = pagerank(edges, iterations=_PR_ITERS, damping=0.85)
    top = ranks.orderBy(F.col("pr").desc(), "node").limit(15)
    w = Window.orderBy(F.col("pr").desc(), "node")
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "node", "pr")
        .orderBy("rank")
    )
