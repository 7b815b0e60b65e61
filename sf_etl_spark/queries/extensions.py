"""Extension-point surface: UDF/UDAF/UDTF lanes, each oracle-checked.

The reference's only extension hook is a raw-SQL type escape
(`Custom(&'static str)`, `sql-builder/src/sql/types.rs:31,226-228`);
Spark's lanes are real code. Three demos, one per lane:

 - ``udtf_bigrams`` — a Python UDTF (Spark 4 table function) exploding
   documents into positioned word bigrams: the row→table extension.
 - ``pandas_udf_zscore`` — an Arrow-batched scalar pandas UDF: the
   vectorized scalar extension.
 - ``dispersion_stats`` — no UDF at all: sample stddev/variance via
   the exact-decimal lane, the "you probably don't need a UDAF" case.

Scale notes: UDTF/pandas-UDF rows stream through Arrow batches with
no driver collect; still, both are the *slow path* — every built-in
stays JVM-side, and these lanes exist for logic Catalyst can't
express (see PLANS.md). The UDTF declares its analyze-time schema
statically so Catalyst can prune/plan around it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from sf_etl_spark.queries import register
from sf_etl_spark.queries.relational import AVGD, davg
from sf_etl_spark.sources import load_table

# Sum of squares of a MONEY column, engine-exact. The naive
# SUMD('x * x') lane diverges: x² ≈ 1e10 needs 21 significant decimal
# digits at scale 10 — beyond double's 17 — so Spark (shortest-repr
# HALF_UP) and DuckDB (true-binary) round the decimal cast apart by
# 1 ulp. Money is exact at scale 2, so cast FIRST (exact on both
# engines), then square in decimal ((18,2)² → scale 4, precision 37:
# no overflow, no rounding anywhere until the final cast out.


def dsumsq_money(col: F.Column) -> F.Column:
    d = col.cast("decimal(18,2)")
    return F.sum(d * d).cast("string").cast("double")


def SUMSQ_MONEY(expr: str) -> str:
    d = f"CAST({expr} AS DECIMAL(18,2))"
    return f"CAST(CAST(sum({d} * {d}) AS VARCHAR) AS DOUBLE)"


def SUMD_MONEY(expr: str) -> str:
    return f"CAST(CAST(sum(CAST({expr} AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"


# ---------------------------------------------------------------------------
# Python UDTF: text → (pos, bigram) rows, lateral-joined per document.
# (Decorated lazily inside the query fn: UDF registration needs an
# active SparkSession, and registry modules import session-free.)
# ---------------------------------------------------------------------------
class BigramUDTF:
    """Word-bigram table function (whitespace tokens, 0-based pos).

    This query exists to exercise the Python-UDTF extension lane; the
    PRODUCTION shape for bigrams is the JVM-side built-in composition
    ``posexplode(split(text)) + concat_ws`` (no Python on the task
    path) — see ``dispersion_stats`` for the no-UDF counter-example.
    """

    def eval(self, text: str):  # noqa: D102 - UDTF contract
        if text is None:
            return
        toks = text.split(" ")
        for i in range(len(toks) - 1):
            yield i, toks[i] + " " + toks[i + 1]


@register(
    "udtf_bigrams",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE lang = 'en'
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1])) AS bigram
      FROM toks
    )
    SELECT bigram, CAST(count(*) AS BIGINT) AS n
    FROM bg
    GROUP BY bigram
    HAVING count(*) >= 8
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
    doc="Python UDTF lateral join: top word bigrams in English docs",
)
def udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    bigrams = udtf(BigramUDTF, returnType="pos int, bigram string")
    rows = d.lateralJoin(bigrams(F.col("text").outer()))
    return (
        rows.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 8)
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Arrow-batched scalar pandas UDF: z-score of order totals against
# broadcast per-status moments (two-pass: exact-decimal moments via
# built-ins, normalization vectorized in Arrow batches).
# ---------------------------------------------------------------------------
def _zscore_fn(total: pd.Series, mean: pd.Series, std: pd.Series) -> pd.Series:
    return (total - mean) / std


@register(
    "pandas_udf_zscore",
    f"""
    WITH m AS (
      SELECT o_orderstatus,
             {AVGD('o_totalprice')} AS mu,
             sqrt(({SUMSQ_MONEY('o_totalprice')}
                   - {SUMD_MONEY('o_totalprice')} * {SUMD_MONEY('o_totalprice')} / count(*))
                  / (count(*) - 1)) AS sigma
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o.o_orderkey, (o.o_totalprice - m.mu) / m.sigma AS zscore
    FROM orders o JOIN m USING (o_orderstatus)
    ORDER BY o.o_orderkey
    LIMIT 500
    """,
    doc="Arrow-batched pandas UDF: per-status z-score of order totals",
)
def pandas_udf_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    sum_lin = F.sum(tp.cast("decimal(18,2)")).cast("string").cast("double")
    m = o.groupBy("o_orderstatus").agg(
        davg("o_totalprice").alias("mu"),
        F.sqrt(
            (dsumsq_money(tp) - sum_lin * sum_lin / F.count(F.lit(1)))
            / (F.count(F.lit(1)) - 1)
        ).alias("sigma"),
    )
    zscore = pandas_udf(_zscore_fn, "double")
    return (
        o.join(F.broadcast(m), "o_orderstatus")
        .select("o_orderkey", zscore("o_totalprice", "mu", "sigma").alias("zscore"))
        .orderBy("o_orderkey")
        .limit(500)
    )


# ---------------------------------------------------------------------------
# Dispersion without any UDF: sample variance/stddev through the
# exact-decimal sum lane (sum-order-free, engine-portable) — built-in
# stddev_samp would be Welford-ordered and diverge across engines.
# ---------------------------------------------------------------------------
@register(
    "dispersion_stats",
    f"""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           ({SUMSQ_MONEY('l_extendedprice')}
             - {SUMD_MONEY('l_extendedprice')} * {SUMD_MONEY('l_extendedprice')} / count(*))
             / (count(*) - 1) AS var_price,
           sqrt(({SUMSQ_MONEY('l_extendedprice')}
             - {SUMD_MONEY('l_extendedprice')} * {SUMD_MONEY('l_extendedprice')} / count(*))
             / (count(*) - 1)) AS std_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="sample variance/stddev via exact-decimal moments (order-free)",
)
def dispersion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ep = F.col("l_extendedprice")
    n = F.count(F.lit(1))
    sum_lin = F.sum(ep.cast("decimal(18,2)")).cast("string").cast("double")
    var = (dsumsq_money(ep) - sum_lin * sum_lin / n) / (n - 1)
    return (
        li.groupBy("l_returnflag")
        .agg(n.alias("n"), var.alias("var_price"), F.sqrt(var).alias("std_price"))
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Grouped-aggregate pandas UDF (true custom UDAF) — the one UDF flavor
# the other lanes don't cover: scalar pandas UDF (`pandas_udf_zscore`),
# UDTF (`udtf_bigrams`), cogrouped map (`asof_pandas_merge`),
# mapInPandas (multimodal) are all demonstrated; this adds
# GROUPED_AGG, the Arrow path for aggregation logic Catalyst can't
# express. The example is a 10%-trimmed mean (robust location
# estimate): sort, drop the exact bottom/top floor(n/10) values,
# average the rest.
#
# Cross-engine parity: the trim boundaries are integer ranks (exact on
# both sides); the remaining float mean differs only in summation
# order, absorbed by ROUND(…, 6) on both sides (the repo-wide
# float-agg rounding rule — values ~1e2 over ~10² rows leave ~1e-11
# absolute drift, five orders below the rounding grain).
#
# Scale: GROUPED_AGG streams each group through Arrow once — memory is
# O(group); partial aggregation does NOT apply (the UDAF is a black
# box to Catalyst), which is exactly why the built-in lanes are
# preferred for anything expressible — this lane documents the
# escape hatch and its cost.
# ---------------------------------------------------------------------------
@register(
    "grouped_agg_trimmed_mean",
    """
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
             count(*)     OVER (PARTITION BY event_type)                          AS n
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_kept,
           ROUND(avg(value), 6)     AS trimmed_mean
    FROM ranked
    WHERE rn > n // 10 AND rn <= n - n // 10
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="custom UDAF via GROUPED_AGG pandas UDF: 10%-trimmed mean per event type",
)
def grouped_agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DoubleType, LongType

    @pandas_udf(DoubleType())
    def trimmed_mean(v: pd.Series) -> float:
        s = v.sort_values(kind="mergesort").to_numpy()
        k = len(s) // 10
        kept = s[k : len(s) - k]
        return float(kept.mean())

    @pandas_udf(LongType())
    def trimmed_count(v: pd.Series) -> int:
        return int(len(v) - 2 * (len(v) // 10))

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return (
        e.groupBy("event_type")
        .agg(
            trimmed_count(F.col("value")).alias("n_kept"),
            F.round(trimmed_mean(F.col("value")), 6).alias("trimmed_mean"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# mapInArrow — the RAWEST Python extension lane: RecordBatch in,
# RecordBatch out, no pandas conversion at all (the pandas lanes pay
# an Arrow→pandas→Arrow round trip per batch; vectorized pyarrow
# compute kernels skip it). Completes the C12 surface: scalar
# pandas_udf, GROUPED_AGG UDAF, cogrouped/applyInPandas, mapInPandas,
# UDTF, and now the arrow-native map. Per-doc char/token stats roll
# up per language JVM-side afterward, so the Python stage stays a
# narrow streaming map (column pruning still reaches the scan: only
# doc_id/lang/text are read).
#
# Parity: utf8_length counts CODEPOINTS (fixture text is ASCII, so it
# equals DuckDB's length()); the token rule is the shared
# spaces+1-on-nonempty convention used by the token_counts lane.
# ---------------------------------------------------------------------------
@register(
    "arrow_batch_textstats",
    """
    WITH d AS (
      SELECT lang,
             length(text) AS n_chars,
             CASE WHEN length(text) = 0 THEN 0
                  ELSE length(text) - length(replace(text, ' ', '')) + 1
             END AS n_toks
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT)    AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_toks) AS BIGINT)  AS total_toks,
           CAST(max(n_toks) AS BIGINT)  AS max_toks
    FROM d
    GROUP BY lang
    ORDER BY lang
    """,
    doc="mapInArrow (RecordBatch-native, no pandas) doc stats + JVM rollup per lang",
)
def arrow_batch_textstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batches):
        for batch in batches:
            text = batch.column("text")
            chars = pc.utf8_length(text)
            spaces = pc.count_substring(text, " ")
            toks = pc.if_else(
                pc.equal(chars, 0),
                pa.scalar(0, pa.int32()),
                pc.add(spaces, 1),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("lang"), chars.cast(pa.int64()), toks.cast(pa.int64())],
                ["lang", "n_chars", "n_toks"],
            )

    d = load_table(spark, sf_dir, "documents").select("lang", "text")
    mapped = d.mapInArrow(stats, "lang string, n_chars long, n_toks long")
    return (
        mapped.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_toks").alias("total_toks"),
            F.max("n_toks").alias("max_toks"),
        )
        .orderBy("lang")
    )
