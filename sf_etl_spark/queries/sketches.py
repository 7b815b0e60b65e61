"""Mergeable-summary operators — the sub-linear state patterns a
100 TB engine leans on when exact global state would not fit (or would
force a full-vocabulary shuffle).

The reference has no sketch surface (SURVEY.md §2 — it is an ETL
client); this module extends the engine with the three classic
mergeable summaries, each expressed so the driver's value-hash gate
still verifies it EXACTLY:

* ``heavy_hitters_twopass`` — frequent-items via bounded-memory
  per-batch candidate generation + exact recount. The OUTPUT is exact
  and partitioning-independent (pigeonhole lemma below), so it gets a
  plain ``GROUP BY … HAVING`` oracle.
* ``hll_rollup_merge`` — Datasketches HLL distinct-count sketches
  aggregated per nation and MERGED up to region without rescanning
  base data (`hll_union_agg`). The oracle verifies the exact counts
  plus the sketch's accuracy contract as a boolean the engine
  computes against its own exact lane.
* ``kll_quantile_merge`` — Datasketches KLL quantile sketches per
  order priority, plus a global sketch produced by MERGING the
  per-group sketches (`kll_sketch_merge_double`). Verified the same
  way: the exact rank of each estimated median must sit inside the
  sketch's rank-error bound.

Scale rationale (the reason these exist): ``count(DISTINCT x)`` and
exact percentiles are one-shot shuffles of live keys; a sketch column
is O(KB) per group, persists in a rollup table, and any later
re-grouping (nation→region→global, day→month→year) is a merge of
stored sketches — zero base-data rescans. That is the only workable
shape for incremental distinct-count / quantile rollups at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sf_etl_spark.queries import register
from sf_etl_spark.queries.llm import _SQL_MD5_H64
from sf_etl_spark.sources import load_table

# Heavy-hitter threshold: report terms with freq * K > n_total
# (i.e. frequency share > 1/K of the token stream).
_HH_K = 100


# ---------------------------------------------------------------------------
# Two-pass exact heavy hitters.
#
# Pass 1 (bounded memory, ZERO shuffle): per Arrow batch, keep terms
# whose in-batch count clears the same 1/K share threshold locally.
# Pigeonhole lemma: if a term's global count satisfies cnt·K > n, then
# summing cnt_b·K ≤ n_b over all batches would give cnt·K ≤ n — a
# contradiction — so EVERY true heavy hitter clears the bar in at
# least one batch, for ANY partitioning of the stream into batches.
# Candidates are therefore a guaranteed superset, ≤ K distinct terms
# per batch (a count > n_b/K can hold for < K items).
#
# Pass 2: exact recount of ONLY the candidate set — the broadcast
# semi join prunes the token stream before its groupBy, so the
# aggregation shuffle carries candidate terms only, never the full
# vocabulary. The global threshold then removes false candidates,
# making the OUTPUT exact and independent of batching. Contrast with
# `vocab_top_terms`, whose single-pass groupBy shuffles every distinct
# term; at web-corpus vocabulary sizes (billions of distinct terms)
# the two-pass shape is the one that survives.
#
# (Classic Misra-Gries keeps O(K) counters by decrementing; the
# per-batch exact-count variant used here has the identical superset
# guarantee with memory bounded by the Arrow batch size, and stays
# vectorized instead of looping per row in Python.)
# ---------------------------------------------------------------------------
@register(
    "heavy_hitters_twopass",
    rf"""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(text), '\s+')) AS term
      FROM documents
    ),
    t AS (SELECT term FROM toks WHERE term <> ''),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM t)
    SELECT term,
           CAST(count(*) AS BIGINT) AS freq,
           (SELECT n_total FROM n)  AS n_total
    FROM t
    GROUP BY term
    HAVING count(*) * {_HH_K} > (SELECT n_total FROM n)
    ORDER BY freq DESC, term
    """,
    doc=f"exact heavy hitters (share > 1/{_HH_K}): bounded-memory candidates + recount",
)
def heavy_hitters_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
    ).filter(F.col("term") != "")

    # Pass 1 emits candidates AND one sentinel row (term=NULL) carrying
    # the batch's token count: the global n derives from pass-1 output
    # (a handful of rows) instead of a third full scan+tokenize of the
    # corpus — at 100 TB that third scan is 50% extra read for one
    # number the candidate pass already observes.
    def _candidates(batches):
        for pdf in batches:
            vc = pdf["term"].value_counts()
            keep = vc[vc * _HH_K > len(pdf)]
            yield pd.DataFrame(
                {
                    "term": [*keep.index.astype(str), None],
                    "n_batch": [0] * len(keep) + [len(pdf)],
                }
            )

    # cache: candidates and the total both read pass-1's (tiny) output;
    # without it each subtree would re-run the scan+tokenize+summary
    # pipeline and the lane would be back to three corpus reads
    pass1 = toks.mapInPandas(_candidates, "term string, n_batch long").cache()
    cands = pass1.filter(F.col("term").isNotNull()).select("term").distinct()
    total = pass1.filter(F.col("term").isNull()).agg(
        F.sum("n_batch").alias("n_total")
    )
    return (
        toks.join(F.broadcast(cands), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .join(F.broadcast(total))
        .filter(F.col("freq") * _HH_K > F.col("n_total"))
        .select("term", "freq", "n_total")
        .orderBy(F.col("freq").desc(), "term")
    )


# ---------------------------------------------------------------------------
# HLL distinct-count rollup: nation-level sketches merged to regions.
#
# The region estimates are produced ONLY from the 25 nation sketches
# (hll_union_agg) — the customer table is never rescanned for the
# rollup, which is the entire point of storing sketch columns. The
# lane also computes the exact region counts (its own verification
# yardstick); `sketch_ok` asserts the estimate honors the HLL accuracy
# contract (lgConfigK=12 ⇒ rsd ≈ 1.6 %; the 5 %/±2 gate is many sigma
# wide, and at fixture cardinalities the sketch is still in exact
# sparse mode anyway). The DuckDB oracle restates the exact counts and
# TRUE — a lost nation sketch, a broken union, or estimate drift
# beyond contract all flip the flag and break the hash.
# ---------------------------------------------------------------------------
@register(
    "hll_rollup_merge",
    """
    SELECT r.r_name,
           CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS exact_customers,
           TRUE AS sketch_ok
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
    doc="HLL sketches per nation, merged to region rollup (hll_union_agg) vs exact",
)
def hll_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    dims = F.broadcast(n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]))

    # Stored-sketch layer: one ~KB sketch per nation. At 100 TB this is
    # the table you persist; every later rollup is a merge of it.
    nation_sk = (
        c.groupBy("c_nationkey")
        .agg(F.hll_sketch_agg("c_custkey", F.lit(12)).alias("sk"))
    )
    region_est = (
        nation_sk.join(dims, nation_sk["c_nationkey"] == dims["n_nationkey"])
        .groupBy("r_name")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    exact = (
        c.join(dims, c["c_nationkey"] == dims["n_nationkey"])
        .groupBy("r_name")
        .agg(F.countDistinct("c_custkey").alias("exact_customers"))
    )
    return (
        exact.join(region_est, "r_name")
        .select(
            "r_name",
            "exact_customers",
            (
                F.abs(F.col("est") - F.col("exact_customers"))
                <= F.greatest(F.col("exact_customers") * 0.05, F.lit(2.0))
            ).alias("sketch_ok"),
        )
        .orderBy("r_name")
    )


# ---------------------------------------------------------------------------
# KLL quantile rollup: per-priority sketches + a GLOBAL median from
# merging the stored per-group sketches (never rescanning rows).
#
# Verification: a KLL(k=200) sketch guarantees the returned quantile's
# normalized RANK error ≤ ~1.65 % (w.h.p.). The lane computes, for
# each estimated median, its exact rank in the underlying data — a
# deterministic integer count — and asserts |rank − 0.5| ≤ 0.05 (3σ
# headroom; KLL compaction is randomized, so the ESTIMATE itself is
# not reproducible, but the contract is). The oracle restates the
# exact group sizes and TRUE flags.
# ---------------------------------------------------------------------------
@register(
    "kll_quantile_merge",
    """
    WITH per AS (
      SELECT o_orderpriority AS grp, CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY o_orderpriority
    ),
    allg AS (SELECT 'ALL' AS grp, CAST(count(*) AS BIGINT) AS n FROM orders)
    SELECT grp, n, TRUE AS median_rank_ok
    FROM (SELECT * FROM per UNION ALL SELECT * FROM allg)
    ORDER BY grp
    """,
    doc="KLL quantile sketches per priority + merged global median; exact-rank contract check",
)
def kll_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    # Stored-sketch layer (what a rollup table would persist).
    per_sk = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.kll_sketch_agg_double("o_totalprice", F.lit(200)).alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    # Global sketch = merge of the five stored sketches — no rescan.
    # kll_sketch_merge_double is a BINARY merge, so fold the collected
    # sketch array with F.aggregate (JVM-side; the array holds one
    # ~KB sketch per group, never row data).
    glob_sk = (
        per_sk.agg(
            F.collect_list("sk").alias("sks"),
            F.sum("n").alias("n"),
        )
        .select(
            F.lit("ALL").alias("grp"),
            F.aggregate(
                F.slice(F.col("sks"), 2, F.size("sks") - 1),
                F.col("sks")[0],
                lambda acc, x: F.kll_sketch_merge_double(acc, x),
            ).alias("sk"),
            "n",
        )
    )
    meds = (
        per_sk.select("grp", "sk", "n")
        .unionByName(glob_sk)
        .select(
            "grp",
            "n",
            F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("med"),
        )
    )
    # Exact rank of each estimate: tag every row with its own group AND
    # the ALL group, join the (6-row) medians broadcast, count <= med.
    tagged = o.select(
        F.col("o_orderpriority").alias("grp"), "o_totalprice"
    ).unionByName(o.select(F.lit("ALL").alias("grp"), "o_totalprice"))
    ranks = (
        tagged.join(F.broadcast(meds), "grp")
        .groupBy("grp", "n")
        .agg(
            F.sum(
                F.when(F.col("o_totalprice") <= F.col("med"), 1).otherwise(0)
            ).alias("n_le")
        )
    )
    return ranks.select(
        "grp",
        "n",
        (
            F.abs(F.col("n_le") / F.col("n") - F.lit(0.5)) <= F.lit(0.05)
        ).alias("median_rank_ok"),
    ).orderBy("grp")


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) set-overlap sketch — distinct-count UNION and
# INTERSECTION estimates from two tiny mergeable summaries (Beyer et
# al., SIGMOD 2007: "On synopses for distinct-value estimation under
# multiset operations"). HLL (above) unions cheaply but cannot
# intersect; KMV is the classic synopsis that estimates J(A,B) and
# |A∩B| from k hash values per side — the building block for audience
# overlap, join-size estimation, and containment scoring.
#
# Sketch build = per-side bottom-k over a keyed 64-bit hash:
# TakeOrderedAndProject, so each partition contributes its local
# bottom-k and only k rows per partition reach the driver-side merge —
# the mergeable-summary shape (union of sketches re-bottom-k'd IS the
# sketch of the union; that exact merge is how K_U is built below).
# Estimators (all deterministic, so the lane is hash-verifiable,
# unlike opaque sketch binaries): with the merged sketch K_U of size k
# and kth-smallest hash v_k normalized to u∈(0,1),
#   |A∪B|^ = (k-1)/u          (or the exact size if the sketch holds
#                              the whole union: u is then meaningless)
#   J^     = |K_U ∩ K_A ∩ K_B| / k
#   |A∩B|^ = J^ · |A∪B|^
# The oracle restates sketch construction AND the exact cardinalities
# the estimates are judged against; both engines evaluate the same
# md5-derived hash, so every row is bit-equal.
# Scale: two parallel bottom-k scans + three broadcast semi joins over
# ≤k-row frames; nothing grows with |orders| except the scans.
# ---------------------------------------------------------------------------
_KMV_K = 200

# DuckDB twin of llm._md5_hash64 for the custkey domain — built on
# the ONE shared signed-int64 md5 twin (llm._SQL_MD5_H64) so a fix to
# the hash expression can never leave the sketch oracles behind
_KMV_SQL_H = _SQL_MD5_H64("'ck' || CAST(k AS VARCHAR)")


@register(
    "kmv_set_overlap",
    f"""
    WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
    b AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
    ha AS (SELECT {_KMV_SQL_H} AS h FROM a),
    hb AS (SELECT {_KMV_SQL_H} AS h FROM b),
    ka AS (SELECT h FROM ha ORDER BY h LIMIT {_KMV_K}),
    kb AS (SELECT h FROM hb ORDER BY h LIMIT {_KMV_K}),
    ku AS (SELECT h FROM (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb))
           ORDER BY h LIMIT {_KMV_K}),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n_sketch, max(h) AS v_k FROM ku),
    inter AS (SELECT CAST(count(*) AS BIGINT) AS n_both
              FROM ku WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
    exact AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_a_exact,
                     (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_b_exact,
                     (SELECT CAST(count(*) AS BIGINT)
                      FROM (SELECT k FROM a INTERSECT SELECT k FROM b)) AS n_inter_exact),
    est AS (
      SELECT n_sketch, n_both, n_a_exact, n_b_exact, n_inter_exact,
             CASE WHEN n_sketch < {_KMV_K} THEN CAST(n_sketch AS DOUBLE)
                  ELSE CAST({_KMV_K} - 1 AS DOUBLE)
                       / (CAST(v_k AS DOUBLE) / 18446744073709551616.0 + 0.5)
             END AS union_est
      FROM m, inter, exact
    )
    SELECT CAST({_KMV_K} AS BIGINT) AS k_param,
           n_sketch, n_both, n_a_exact, n_b_exact, n_inter_exact,
           union_est,
           (CAST(n_both AS DOUBLE) / CAST(n_sketch AS DOUBLE)) * union_est AS inter_est
    FROM est
    """,
    doc="KMV bottom-k sketch: union/intersection cardinality estimates + exact ground truth",
)
def kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sf_etl_spark.queries.llm import _md5_hash64

    orders = load_table(spark, sf_dir, "orders")

    def sketch(status: str) -> DataFrame:
        keys = (
            orders.filter(F.col("o_orderstatus") == status)
            .select(F.col("o_custkey").alias("k"))
            .distinct()
        )
        hashed = keys.select(
            _md5_hash64(F.concat(F.lit("ck"), F.col("k").cast("string"))).alias("h")
        )
        # bottom-k = TakeOrderedAndProject: k rows per partition max
        return hashed.orderBy("h").limit(_KMV_K)

    def dset(status: str) -> DataFrame:
        return (
            orders.filter(F.col("o_orderstatus") == status)
            .select(F.col("o_custkey").alias("k"))
            .distinct()
        )

    ka, kb = sketch("F"), sketch("O")
    # sketch MERGE: union the two summaries, re-bottom-k — never the base data
    ku = ka.unionByName(kb).distinct().orderBy("h").limit(_KMV_K)
    m = ku.agg(
        F.count(F.lit(1)).alias("n_sketch"), F.max("h").alias("v_k")
    )
    n_both = (
        ku.join(F.broadcast(ka), "h", "left_semi")
        .join(F.broadcast(kb), "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    exact = (
        dset("F")
        .agg(F.count(F.lit(1)).alias("n_a_exact"))
        .crossJoin(dset("O").agg(F.count(F.lit(1)).alias("n_b_exact")))
        .crossJoin(
            dset("F")
            .join(dset("O"), "k", "left_semi")
            .agg(F.count(F.lit(1)).alias("n_inter_exact"))
        )
    )
    est = (
        m.crossJoin(n_both)
        .crossJoin(exact)
        .withColumn(
            "union_est",
            F.when(
                F.col("n_sketch") < _KMV_K, F.col("n_sketch").cast("double")
            ).otherwise(
                F.lit(float(_KMV_K - 1))
                / (
                    F.col("v_k").cast("double") / F.lit(18446744073709551616.0)
                    + F.lit(0.5)
                )
            ),
        )
    )
    return est.select(
        F.lit(_KMV_K).cast("bigint").alias("k_param"),
        "n_sketch",
        "n_both",
        "n_a_exact",
        "n_b_exact",
        "n_inter_exact",
        "union_est",
        (
            (F.col("n_both").cast("double") / F.col("n_sketch").cast("double"))
            * F.col("union_est")
        ).alias("inter_est"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch point estimates — the frequency-query synopsis that
# completes the sketch family (HLL: distinct counts; KLL: quantiles;
# KMV: set overlap; heavy hitters: top items; CM: "how often does X
# occur?" for ANY X, from d×w counters). Cormode & Muthukrishnan,
# J. Algorithms 2005. The estimate min_i C[i][h_i(x)] is a guaranteed
# OVERestimate (collisions only add), with error ≤ εN at probability
# 1-δ for w=⌈e/ε⌉, d=⌈ln 1/δ⌉.
#
# Deterministic md5-derived row hashes make the whole sketch — and
# therefore the estimates — hash-verifiable; the lane emits the exact
# count beside each estimate so the overestimate-only contract is
# visible data, and a guard column (est >= exact) would break the
# hash if a collision were LOST rather than added.
#
# Scale: the sketch is a FIXED d×w=4×256 counter grid built by a
# partial-aggregated groupBy over (row, cell) — mergeable by cell-wise
# sum (the same rollup-store shape as the HLL lane); point queries are
# a broadcast of the query set against the 1024-row sketch.
# ---------------------------------------------------------------------------
_CM_D = 4
_CM_W = 256


def _cm_sql_h(i: int) -> str:
    """DuckDB twin of the engine's row-i cell hash: non-negative
    md5-int64 mod w (pmod normalization — DuckDB % keeps the dividend
    sign). Shares llm._SQL_MD5_H64 for the signed hash itself."""
    signed = _SQL_MD5_H64(f"'cm{i}:' || tok")
    return f"(({signed} % {_CM_W}) + {_CM_W}) % {_CM_W}"


@register(
    "countmin_point_estimates",
    f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE lang = 'en'
    ), exact AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY tok
    ), cells AS (
      {" UNION ALL ".join(
          f"SELECT {i} AS row_i, {_cm_sql_h(i)} AS cell, n FROM exact"
          for i in range(_CM_D)
      )}
    ), sketch AS (
      SELECT row_i, cell, CAST(sum(n) AS BIGINT) AS c
      FROM cells GROUP BY row_i, cell
    ), q AS (
      SELECT tok, n FROM exact ORDER BY n DESC, tok LIMIT 10
    ), probes AS (
      {" UNION ALL ".join(
          f"SELECT tok, n, {i} AS row_i, {_cm_sql_h(i)} AS cell FROM q"
          for i in range(_CM_D)
      )}
    )
    SELECT p.tok, p.n AS exact_n,
           CAST(min(s.c) AS BIGINT) AS cm_est,
           CAST(min(s.c) - p.n AS BIGINT) AS overcount
    FROM probes p JOIN sketch s ON p.row_i = s.row_i AND p.cell = s.cell
    GROUP BY p.tok, p.n
    ORDER BY exact_n DESC, p.tok
    """,
    doc=f"count-min sketch ({_CM_D}x{_CM_W}): point frequency estimates vs exact, top-10 tokens",
)
def countmin_point_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sf_etl_spark.queries.llm import _md5_hash64

    def h(i: int, tok_col) -> F.Column:
        return F.pmod(
            _md5_hash64(F.concat(F.lit(f"cm{i}:"), tok_col)), F.lit(_CM_W)
        )

    d = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    exact = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # build the d×w grid from the per-token exact counts (same result
    # as hashing the raw stream, one shuffle cheaper). The d rows are
    # an EXPLODE of d per-row structs, not d unionByName branches: a
    # union of projections over an AGGREGATED frame makes Spark
    # re-run the token groupBy once per branch (measured 12 scans on
    # the AGMS twin below); the explode computes all d cells in one
    # pass over one aggregation
    sketch = (
        exact.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("row_i"),
                            h(i, F.col("tok")).alias("cell"),
                        )
                        for i in range(_CM_D)
                    ]
                )
            ).alias("rc"),
            "n",
        )
        .select("rc.row_i", "rc.cell", "n")
        .groupBy("row_i", "cell")
        .agg(F.sum("n").alias("c"))
    )
    q = exact.orderBy(F.col("n").desc(), "tok").limit(10)
    # same explode-not-union rule for the probe rows: q sits on top of
    # the token aggregation, and a 4-branch union would re-run it 4×
    probes = q.select(
        "tok",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"), h(i, F.col("tok")).alias("cell")
                    )
                    for i in range(_CM_D)
                ]
            )
        ).alias("rc"),
    ).select("tok", "n", "rc.row_i", "rc.cell")
    return (
        F.broadcast(probes)
        .join(sketch, ["row_i", "cell"])
        .groupBy("tok", "n")
        .agg(F.min("c").alias("cm_est"))
        .select(
            "tok",
            F.col("n").alias("exact_n"),
            F.col("cm_est").cast("bigint").alias("cm_est"),
            (F.col("cm_est") - F.col("n")).cast("bigint").alias("overcount"),
        )
        .orderBy(F.col("exact_n").desc(), "tok")
    )


# ---------------------------------------------------------------------------
# Join-size estimation from AGMS (signed) sketches — the optimizer-
# statistics estimator: |A ⋈ B| on a key is Σ_k f_A(k)·f_B(k), and
# the AGMS/fast-AGMS inner product Σ_c a_i(c)·b_i(c) over SIGNED
# cell sums a_i(c) = Σ_{k∈c} s_i(k)·f_A(k) is an UNBIASED estimate of
# it (Alon-Gittens-Matias-Szegedy F2 machinery; the count-min variant
# without signs overestimates by N_A·N_B/w cross terms — measured
# 15.6× too high on this very fixture, which is why the signed form
# is the one query optimizers actually keep). Median over d=5
# independent rows bounds the variance.
#
# Cell and sign hashes are independent md5 derivations (prefixes
# 'cj'/'cs'), so everything is deterministic and hash-verifiable;
# the exact join count sits beside the estimate, making the error
# visible data. Scale: two fixed 5×1024 signed grids built from
# partial-agged frequency tables; the dot product is a (row, cell)
# equi-join of two 5k-row frames; exact-side cost is one count —
# the sketches themselves never scan the other table, which is the
# point: per-column sketches stored at ingest answer ANY later
# join-size question in O(d·w).
# ---------------------------------------------------------------------------
_AGMS_D = 5
_AGMS_W = 1024


def _agms_sql_cell(i: int, expr: str) -> str:
    signed = _SQL_MD5_H64(f"'cj{i}:' || {expr}")
    return f"(({signed} % {_AGMS_W}) + {_AGMS_W}) % {_AGMS_W}"


def _agms_sql_sign(i: int, expr: str) -> str:
    # low bit of the signed hash (& 1 == the unsigned parity: two's
    # complement preserves low bits), mapped to ±1
    signed = _SQL_MD5_H64(f"'cs{i}:' || {expr}")
    return f"(1 - 2 * ({signed} & 1))"


@register(
    "agms_join_size",
    f"""
    WITH fo AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS k, CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY o_orderkey
    ), fl AS (
      SELECT CAST(l_orderkey AS VARCHAR) AS k, CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_orderkey
    ), so AS (
      {" UNION ALL ".join(
          f"SELECT {i} AS row_i, {_agms_sql_cell(i, 'k')} AS cell, "
          f"{_agms_sql_sign(i, 'k')} * n AS sn FROM fo"
          for i in range(_AGMS_D)
      )}
    ), sl AS (
      {" UNION ALL ".join(
          f"SELECT {i} AS row_i, {_agms_sql_cell(i, 'k')} AS cell, "
          f"{_agms_sql_sign(i, 'k')} * n AS sn FROM fl"
          for i in range(_AGMS_D)
      )}
    ), go AS (
      SELECT row_i, cell, CAST(sum(sn) AS BIGINT) AS a FROM so GROUP BY row_i, cell
    ), gl AS (
      SELECT row_i, cell, CAST(sum(sn) AS BIGINT) AS b FROM sl GROUP BY row_i, cell
    ), dots AS (
      SELECT go.row_i, CAST(sum(go.a * gl.b) AS BIGINT) AS dot
      FROM go JOIN gl ON go.row_i = gl.row_i AND go.cell = gl.cell
      GROUP BY go.row_i
    ), med AS (
      SELECT dot FROM (
        SELECT dot, row_number() OVER (ORDER BY dot) AS rn FROM dots
      ) WHERE rn = {_AGMS_D // 2 + 1}
    ), exact AS (
      SELECT CAST(count(*) AS BIGINT) AS exact_join_rows
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )
    SELECT exact_join_rows,
           CAST(dot AS BIGINT) AS agms_est,
           CAST(dot - exact_join_rows AS BIGINT) AS err
    FROM med, exact
    """,
    doc=f"unbiased join-size estimate via AGMS signed sketches ({_AGMS_D}x{_AGMS_W}, median row)",
)
def agms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sf_etl_spark.queries.llm import _md5_hash64

    def cell(i: int, col) -> F.Column:
        return F.pmod(_md5_hash64(F.concat(F.lit(f"cj{i}:"), col)), F.lit(_AGMS_W))

    def sign(i: int, col) -> F.Column:
        # parity of an INDEPENDENT md5 derivation ('cs' prefix); the
        # DuckDB twin takes UBIGINT % 2 = the same low bit
        return 1 - 2 * F.pmod(
            _md5_hash64(F.concat(F.lit(f"cs{i}:"), col)).bitwiseAND(F.lit(1)),
            F.lit(2),
        )

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def freq(df: DataFrame, key: str) -> DataFrame:
        return df.groupBy(F.col(key).cast("string").alias("k")).agg(
            F.count(F.lit(1)).alias("n")
        )

    def sketch(fdf: DataFrame, out: str) -> DataFrame:
        # d rows via ONE explode over the frequency aggregation — a
        # d-branch unionByName re-runs the groupBy per branch
        # (measured: 12 FileScans for this lane's whole plan; the
        # explode form plans 3 — at 100 TB, 5 redundant base scans vs
        # one). The repartition matters: AQE coalesces the small freq
        # shuffle to ONE partition, which would serialize the 2d md5
        # chains onto one thread (measured 5.2 s vs 1.6 s at sf0.1);
        # spreading the key table first keeps the hash work parallel
        # for one tiny extra exchange.
        par = fdf.sparkSession.sparkContext.defaultParallelism
        return (
            fdf.repartition(par)
            .select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(i).alias("row_i"),
                                cell(i, F.col("k")).alias("cell"),
                                (sign(i, F.col("k")) * F.col("n")).alias("sn"),
                            )
                            for i in range(_AGMS_D)
                        ]
                    )
                ).alias("rc")
            )
            .select("rc.row_i", "rc.cell", "rc.sn")
            .groupBy("row_i", "cell")
            .agg(F.sum("sn").alias(out))
        )

    so = sketch(freq(orders, "o_orderkey"), "a")
    sl = sketch(freq(li, "l_orderkey"), "b")
    dots = (
        so.join(sl, ["row_i", "cell"])
        .groupBy("row_i")
        .agg(F.sum(F.col("a") * F.col("b")).alias("dot"))
    )
    med = dots.agg(
        F.element_at(
            F.array_sort(F.collect_list("dot")), _AGMS_D // 2 + 1
        ).alias("agms_est")
    )
    exact = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .agg(F.count(F.lit(1)).alias("exact_join_rows"))
    )
    return med.crossJoin(F.broadcast(exact)).select(
        "exact_join_rows",
        F.col("agms_est").cast("bigint").alias("agms_est"),
        (F.col("agms_est") - F.col("exact_join_rows")).cast("bigint").alias("err"),
    )
