"""Connected components over a pair graph — the clustering stage of
near-duplicate removal.

Pair-finding ops (``dedup_minhash_lsh``, ``dedup_exact_substring``,
``ann_srp_lsh_pairs``) emit EDGES; production dedup needs the
transitive closure: duplicate CLUSTERS, a canonical representative
per cluster, and the non-canonical rows dropped. This is min-label
propagation (the Pregel/GraphX connected-components recipe) in plain
DataFrame ops — no GraphFrames dependency.

Scale notes:
- Each iteration is one join + one min-aggregate, both hash-
  partitioned on the vertex id — the shuffle partitioning is stable
  across iterations so AQE/exchange reuse keeps re-shuffling cheap.
- Iterations needed = graph diameter under min-propagation; dedup
  graphs are dense clumps (near-cliques), so diameters are small.
  For adversarial long-chain graphs, the large-star/small-star
  algorithm (alternating pointer-doubling) drops rounds to
  O(log n) — noted as the upgrade path, not needed for dedup clumps.
- ``localCheckpoint`` truncates lineage each round; without it the
  plan doubles per iteration and analysis time explodes.
- The driver-side loop tests ONE scalar (changed-count) per round —
  the data never leaves the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    vertex_col: str = "vertex",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every vertex with the minimum vertex id reachable from it
    (= its component id). Vertices absent from ``edges`` come out as
    singleton components. Raises if not converged in ``max_iter``."""
    # checkpoint the symmetrized edges ONCE: the loop re-references
    # them every round, and a lazy plan would re-derive the edge list
    # (often an expensive pair-finding pipeline) per iteration
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = vertices.select(
        F.col(vertex_col).alias("v"), F.col(vertex_col).alias("label")
    ).localCheckpoint()

    for _ in range(max_iter):
        msgs = (
            sym.join(labels, sym.a == labels.v)
            .select(F.col("b").alias("v"), F.col("label").alias("nlabel"))
            .groupBy("v")
            .agg(F.min("nlabel").alias("nlabel"))
        )
        # checkpoint BEFORE the convergence count so the join runs
        # once per round — the count and the next round's labels both
        # read the materialized result
        upd = labels.join(msgs, "v", "left").select(
            "v",
            "label",
            F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias(
                "new_label"
            ),
        ).localCheckpoint()
        changed = upd.filter(F.col("new_label") < F.col("label")).count()
        labels = upd.select("v", F.col("new_label").alias("label"))
        if changed == 0:
            return labels.select(
                F.col("v").alias(vertex_col), F.col("label").alias("component")
            )
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")
