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


def _pr_sql(edges_cte: str, topk: int) -> str:
    """Chained-CTE replay of the 3-iteration power method, mirroring
    operators/graph.py:pagerank op for op (same parenthesization, same
    decimal lane). ``edges_cte`` must define an ``edges(src, dst)``
    relation (plus any CTEs it needs); the replay assumes every node
    has at least one in-edge (true for any both-orientations
    undirected edge set — the engine's zero-contribution union would
    otherwise keep teleport-only nodes this SQL drops)."""
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
    WITH {edges_cte}, deg AS (
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
    SELECT rank, node, pr FROM ranked WHERE rank <= {topk} ORDER BY rank
    """


_CS_EDGES_CTE = """pairs AS (
      SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS c,
                      's' || CAST(l.l_suppkey AS VARCHAR) AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    )"""


@register(
    "pagerank_topk",
    _pr_sql(_CS_EDGES_CTE, 15),
    doc=f"PageRank ({_PR_ITERS} iterations, d=0.85) on the customer↔supplier graph, top 15",
    executes_on_construct=True,
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


# ---------------------------------------------------------------------------
# Triangle counting — the clustering/cohesion primitive (community
# density, spam/fraud motifs, graph health metrics) over the part
# co-occurrence graph (parts bought together in one order).
#
# Scale shape: the classic degree-ordered node-iterator. Every
# undirected edge is oriented from its lower-(degree, id) endpoint to
# the higher one, so each triangle is counted EXACTLY once and — the
# point — wedge generation is bounded by sum(out_deg^2) where
# out-degrees are capped by orientation (a hub of degree d that would
# naively generate C(d,2) wedges fans out only toward HIGHER-degree
# nodes). All stages are equi-joins: edges x edges on the wedge pivot,
# wedges x edges on the closing pair. No node ever needs its full
# neighborhood in memory, unlike adjacency-list formulations.
#
# The oracle enumerates the same triangles id-ordered (u<v<w): both
# orientation schemes count each undirected triangle exactly once, and
# per-node PARTICIPATION counts (each triangle credits its 3 corners)
# are orientation-independent, so the hashes agree.
# ---------------------------------------------------------------------------
@register(
    "triangle_count",
    """
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    tri AS (
      SELECT a.u AS x, a.v AS y, b.v AS z
      FROM e a
      JOIN e b ON a.u = b.u AND a.v < b.v
      JOIN e c ON c.u = a.v AND c.v = b.v
    ),
    total AS (SELECT CAST(count(*) AS BIGINT) AS t FROM tri),
    nodes AS (
      SELECT x AS n FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    )
    SELECT n AS l_partkey,
           CAST(count(*) AS BIGINT) AS n_triangles,
           (SELECT t FROM total)    AS total_triangles
    FROM nodes
    GROUP BY n
    ORDER BY n_triangles DESC, l_partkey
    LIMIT 50
    """,
    doc="degree-ordered triangle counting on the part co-occurrence graph; top-50 nodes",
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Per-order co-occurrence pairs WITHOUT the orderkey self-join
    # (r16, guide §2.3/§2.4 — same reshape as the dedup-cluster edge
    # derivation): group the part ids per order — TPC-H orders carry
    # ≤7 line items, so collect_set is bounded and skew-free — and
    # expand the ordered pairs map-side from the sorted array. The
    # old a⋈b equi-join shuffled lineitem twice and pushed the pair
    # fan-out through join machinery; the pair VOLUME is unchanged
    # (it was the join's output too), only the machinery is gone.
    # Interleaved full-lane A/B (noop): sf1 probe 60.6 -> 26.4 s
    # (2.3x, the win GROWS with data); sf0.1 4.9 -> 6.9 s — a
    # KNOWN local-mode cost, deliberately accepted: with tiny data
    # AQE coalesces the pre-pair agg to a handful of partitions and
    # the downstream deg/orient/wedge stages inherit that width
    # (pinning the width back with an explicit repartition recovered
    # sf0.1 to 5.3 s but cost +3 s at sf1 and pins a user width that
    # cannot grow with data — scale-wrong, rejected). The 100 TB
    # shape wins; pair sets and lane output verified identical.
    grp = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pair_expr = F.expr(
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps) - i - 1), y -> struct(x AS u, y AS v))))"
    )
    und = grp.select(F.explode(pair_expr).alias("p")).select("p.u", "p.v").distinct()
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        # total order aligned with (deg, id): rank fits a long because
        # both components are < 2^31
        .select("node", (F.col("deg") * F.lit(4294967296) + F.col("node")).alias("rank"))
    )
    ranked = (
        und.join(deg.withColumnRenamed("node", "u").withColumnRenamed("rank", "ru"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("rank", "rv"), "v")
    )
    oriented = ranked.select(
        F.when(F.col("ru") < F.col("rv"), F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(F.col("ru") < F.col("rv"), F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.greatest("ru", "rv").alias("r_dst"),
    )
    w1, w2 = oriented.alias("w1"), oriented.alias("w2")
    # closing-edge membership test on ONE packed 64-bit key instead of
    # the (x, y) two-column key: both ids are < 2^31 (same bound the
    # rank packing above relies on), and the wedge relation is the
    # biggest thing this lane shuffles — the single-long join key
    # measured 2.1x faster end-to-end at sf0.1 (A/B best-of-3,
    # value-identical; PLANS.md round 11)
    wedges = w1.join(
        w2,
        (F.col("w1.src") == F.col("w2.src")) & (F.col("w1.r_dst") < F.col("w2.r_dst")),
    ).select(
        F.col("w1.src").alias("s"),
        F.col("w1.dst").alias("x"),
        F.col("w2.dst").alias("y"),
        (F.col("w1.dst") * F.lit(4294967296) + F.col("w2.dst")).alias("xy"),
    )
    closing = oriented.select(
        (F.col("src") * F.lit(4294967296) + F.col("dst")).alias("xy")
    )
    tri = wedges.join(closing, "xy")
    nodes = tri.select(F.explode(F.array("s", "x", "y")).alias("l_partkey"))
    counts = nodes.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_triangles"))
    # total triangles from the PER-NODE counts, not a second pass over
    # tri: every triangle credits exactly its 3 corners, so
    # sum(n_triangles) div 3 == count(tri) — an exact integer identity.
    # The pre-r15 shape referenced tri twice (a count agg + the node
    # explode); AQE stage reuse absorbed most of the recompute but the
    # second walk of the wedge join still cost ~10% of the lane
    # (A/B best-of-3: 5.2 s → 4.8 s) and at 100 TB the biggest
    # intermediate is now provably computed once. `counts` (one row
    # per part) is the only frame read twice — its shuffle stage is
    # reused — and the scalar re-attaches as a broadcast, never a
    # single-partition window over the node counts.
    total = counts.agg(F.expr("sum(n_triangles) div 3").alias("total_triangles"))
    return (
        counts.join(F.broadcast(total))
        .orderBy(F.col("n_triangles").desc(), "l_partkey")
        .limit(50)
        .select("l_partkey", "n_triangles", "total_triangles")
    )


# ---------------------------------------------------------------------------
# TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004) — the
# SAME pagerank operator re-targeted at a word co-occurrence graph:
# nodes are tokens of the English corpus, an (undirected) edge links
# words that appear adjacent in any document. Centrality in that
# graph ranks corpus keywords — the classic unsupervised keyword/
# keyphrase primitive, and the operator-reuse proof for the graph
# surface (one pagerank implementation, two domains).
#
# Determinism: the co-occurrence edge set is canonicalized
# (least, greatest) + distinct, so multiplicity and orientation are
# identical in both engines; the power iteration itself rides the
# exact-decimal fan-in lane (operators/graph.py). Scale: the edge
# derivation is one narrow tokenize→explode + partial-agged distinct;
# the graph is vocabulary-sized (<< corpus-sized), so iterations cost
# O(|vocab edges|), independent of document count beyond the scan.
# ---------------------------------------------------------------------------
_WORD_EDGES_CTE = """toks AS (
      SELECT string_split(text, ' ') AS t FROM documents WHERE lang = 'en'
    ), adj AS (
      SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1])) AS b
      FROM toks
    ), cpairs AS (
      SELECT DISTINCT least(string_split(b, ' ')[1], string_split(b, ' ')[2]) AS w1,
                      greatest(string_split(b, ' ')[1], string_split(b, ' ')[2]) AS w2
      FROM adj
      WHERE string_split(b, ' ')[1] <> string_split(b, ' ')[2]
    ), edges AS (
      SELECT w1 AS src, w2 AS dst FROM cpairs
      UNION ALL
      SELECT w2 AS src, w1 AS dst FROM cpairs
    )"""


@register(
    "keyword_textrank",
    _pr_sql(_WORD_EDGES_CTE, 20),
    doc="TextRank keywords: pagerank over the word-adjacency graph, top 20",
    executes_on_construct=True,
)
def keyword_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sf_etl_spark.operators.graph import pagerank

    d = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    # size >= 2 guard: Spark's sequence(1, n-1) DESCENDS for n < 2
    # (element_at(t, 0) crash on a 1-token doc) where DuckDB's
    # generate_series is empty — filter short docs on both sides
    toks = d.select(F.split("text", " ").alias("t")).filter(F.size("t") >= 2)
    adj = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("t"), i).alias("a"),
                    F.element_at(F.col("t"), i + 1).alias("b"),
                ),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    cpairs = (
        adj.filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("w1"),
            F.greatest("a", "b").alias("w2"),
        )
        .distinct()
    )
    edges = cpairs.select(F.col("w1").alias("src"), F.col("w2").alias("dst")).unionAll(
        cpairs.select(F.col("w2").alias("src"), F.col("w1").alias("dst"))
    )
    ranks = pagerank(edges, iterations=_PR_ITERS, damping=0.85)
    top = ranks.orderBy(F.col("pr").desc(), "node").limit(20)
    w = Window.orderBy(F.col("pr").desc(), "node")
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "node", "pr")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Multi-hop reachability — breadth-first min-hop distances from a
# source node, bounded depth. The "blast radius" / neighborhood-
# expansion primitive (fraud rings around a flagged account, supply-
# chain exposure, recommendation candidates N hops out); the oracle is
# a recursive CTE, which makes this the registry's proof that the
# engine's ITERATIVE frontier expansion matches the declarative
# fixpoint semantics exactly.
#
# Scale: see operators/graph.py:bfs_hops — per round ONE frontier⋈edges
# equi-join + distinct + anti-join against the visited set; every
# frame is localCheckpoint'd so the plan never deepens, and the only
# driver traffic is the per-round frontier count (a bounded scalar,
# same policy as connected_components). State is O(reached nodes),
# rounds are bounded by max_hops — watermark-like state bounding for
# graphs.
# ---------------------------------------------------------------------------
@register(
    "bfs_shortest_paths",
    """
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS c,
                      's' || CAST(l.l_suppkey AS VARCHAR) AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ), walk(node, d) AS (
      SELECT 'c1' AS node, 0 AS d
      UNION
      SELECT e.dst AS node, w.d + 1 AS d
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.d < 4
    )
    SELECT node, CAST(min(d) AS INT) AS hops
    FROM walk
    GROUP BY node
    ORDER BY hops, node
    """,
    doc="BFS min-hop distances from customer c1, depth<=4, vs recursive-CTE fixpoint",
    executes_on_construct=True,
)
def bfs_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sf_etl_spark.operators.graph import bfs_hops

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
    sources = spark.createDataFrame([("c1",)], ["node"])
    return (
        bfs_hops(edges, sources, max_hops=4)
        .select("node", F.col("hops").cast("int").alias("hops"))
        .orderBy("hops", "node")
    )
