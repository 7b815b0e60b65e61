"""Training-data pipeline operators over `documents`.

The ops a 100 TB pretraining corpus actually goes through between
"deduped" and "fed to the trainer" — each one a deterministic,
engine-portable DataFrame plan with a DuckDB oracle:

 - ``split_train_test`` — hash-salted split assignment. NEVER
   ``rand()``: the split must be reproducible across runs, engines,
   and retries, so the split key is a keyed hash of the stable doc id.
 - ``sample_per_label_cap`` — class-balanced downsampling: at most N
   docs per language, chosen by hash order (unbiased w.r.t. any data
   attribute), via one partitioned window.
 - ``pack_token_shards`` — token-budget shard assignment: running
   token cumsum → shard index. The window partitions by ``lang`` so
   the prefix sum parallelizes per key; a single global ordering
   would serialize onto one task at corpus scale (the same
   hierarchical-prefix-sum caveat PLANS.md notes for global sorts).
 - ``decontaminate_ngram_overlap`` — benchmark decontamination: flag
   training docs sharing any word 5-gram with the held-out set. The
   overlap test is a shingle equi-join (hash join on the 5-gram), the
   same sub-quadratic shape as the LSH verification stages.

Portability notes: the split hash is the md5-top-64 trick shared with
``dedup_simhash`` (both engines evaluate it bit-identically); all
sampling orders are md5-derived, not ``rand()``-derived.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sf_etl_spark.queries import register
from sf_etl_spark.sources import load_table

# unsigned md5-top-64 (both engines agree bit-for-bit; see
# queries/llm.py _md5_hash64 for the signed variant + derivation)
_SPLIT_SALT = "split:v1:"


def _md5_u64(col) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 16), 16, 10).cast("decimal(20,0)")


def _sql_md5_u64(expr: str) -> str:
    return f"CAST(('0x' || substring(md5({expr}),1,16)) AS UBIGINT)"


TRAIN_PCT = 90  # train share of the 100-bucket hash space


@register(
    "split_train_test",
    f"""
    SELECT doc_id, lang,
           CASE WHEN {_sql_md5_u64(f"'{_SPLIT_SALT}' || CAST(doc_id AS VARCHAR)")} % 100
                     < {TRAIN_PCT}
                THEN 'train' ELSE 'test' END AS split
    FROM documents
    ORDER BY doc_id
    """,
    doc=f"deterministic {TRAIN_PCT}/{100 - TRAIN_PCT} train/test split by salted doc-id hash",
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(
        _md5_u64(F.concat(F.lit(_SPLIT_SALT), F.col("doc_id").cast("string"))),
        F.lit(100),
    )
    split = F.when(bucket < TRAIN_PCT, F.lit("train")).otherwise(F.lit("test"))
    return d.select("doc_id", "lang", split.alias("split")).orderBy("doc_id")


LABEL_CAP = 40


@register(
    "sample_per_label_cap",
    f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    SELECT doc_id, lang, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= {LABEL_CAP}
    ORDER BY lang, rk
    """,
    doc=f"class-balanced downsample: ≤{LABEL_CAP} docs per language by hash order",
)
def sample_per_label_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("cap:"), F.col("doc_id").cast("string"))), F.col("doc_id")
    )
    return (
        d.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= LABEL_CAP)
        .select("doc_id", "lang", "rk")
        .orderBy("lang", "rk")
    )


SHARD_TOKEN_BUDGET = 5_000


@register(
    "pack_token_shards",
    f"""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS BIGINT)
               AS n_tokens
      FROM documents
    ), packed AS (
      SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS before_tokens
      FROM toks
    )
    SELECT doc_id, lang, n_tokens,
           CAST(COALESCE(before_tokens, 0) // {SHARD_TOKEN_BUDGET} AS INT) AS shard
    FROM packed
    ORDER BY lang, doc_id
    """,
    doc=f"token-budget shard packing: per-lang running cumsum // {SHARD_TOKEN_BUDGET}",
)
def pack_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.filter(F.split("text", " "), lambda x: F.length(x) > 0)).cast(
        "bigint"
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = d.select("doc_id", "lang", n_tokens.alias("n_tokens"))
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        toks.withColumn(
            "shard", F.floor(before / SHARD_TOKEN_BUDGET).cast("int")
        )
        .select("doc_id", "lang", "n_tokens", "shard")
        .orderBy("lang", "doc_id")
    )


@register(
    "clean_text_normalize",
    r"""
    WITH c AS (
      SELECT doc_id, length(text) AS n_chars_raw,
             trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS clean
      FROM documents
    )
    SELECT doc_id,
           CAST(n_chars_raw AS INT) AS n_chars_raw,
           CAST(length(clean) AS INT) AS n_chars_clean,
           md5(clean) AS clean_md5
    FROM c
    ORDER BY doc_id
    """,
    doc="text normalization (lower, whitespace collapse, trim); md5 proves byte parity",
)
def clean_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first stage of every pretraining cleaning pipeline. The
    md5 of the normalized string is part of the output, so the oracle
    hash-checks the EXACT cleaned bytes across engines — regexes here
    are restricted to classes Java regex and RE2 interpret
    identically (``\\s``, no lookaround, no unicode property escapes).
    Narrow per-row transform, no shuffle.
    """
    clean = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.length("text").cast("int").alias("n_chars_raw"),
            F.length(clean).cast("int").alias("n_chars_clean"),
            F.md5(clean).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


@register(
    "repetition_metrics",
    """
    WITH words AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS w
      FROM documents
    ), wc AS (
      SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w
    ), wagg AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_words,
             CAST(count(*) AS DOUBLE) / sum(c) AS distinct_frac,
             CAST(max(c) AS DOUBLE) / sum(c) AS top_word_frac
      FROM wc GROUP BY doc_id
    ), toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> length(x) > 0) AS t
      FROM documents
    ), bg AS (
      SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
                                           i -> t[i] || ' ' || t[i+1])) AS b
      FROM toks WHERE len(t) >= 2
    ), bc AS (
      SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b
    ), bagg AS (
      SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_bigram_frac
      FROM bc GROUP BY doc_id
    )
    SELECT w.doc_id, w.n_words, w.distinct_frac, w.top_word_frac, b.top_bigram_frac
    FROM wagg w LEFT JOIN bagg b ON w.doc_id = b.doc_id
    ORDER BY w.doc_id
    """,
    doc="Gopher-style repetition quality: distinct-word, top-word, top-bigram fractions",
)
def repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filtering (the Gopher/MassiveText
    recipe): heavily repetitive documents are low-quality training
    data. All fractions come from two map-side-combined count
    aggregations (words, bigrams) — the explode never crosses a
    shuffle unaggregated.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda x: F.length(x) > 0)).alias("w"),
    )
    wc = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    wagg = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        (F.count(F.lit(1)).cast("double") / F.sum("c")).alias("distinct_frac"),
        (F.max("c").cast("double") / F.sum("c")).alias("top_word_frac"),
    )
    toks = F.col("_toks")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    bg = (
        d.withColumn("_toks", F.filter(F.split("text", " "), lambda x: F.length(x) > 0))
        .filter(F.size("_toks") >= 2)
        .select("doc_id", F.explode(bigrams).alias("b"))
    )
    bc = bg.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    bagg = bc.groupBy("doc_id").agg(
        (F.max("c").cast("double") / F.sum("c")).alias("top_bigram_frac")
    )
    return (
        wagg.join(bagg, "doc_id", "left")
        .select("doc_id", "n_words", "distinct_frac", "top_word_frac", "top_bigram_frac")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# The capstone: one composed corpus-preparation pipeline — normalize →
# quality-gate → exact-dedup on normalized bytes → split → per-split
# rollup — exactly the chain the individual ops above run in
# production, registered as a single plan so the gate verifies the
# COMPOSITION (operator interactions, not just operators).
# Scale shape: narrow transforms → one dedup aggregation keyed on the
# content hash → one rollup aggregation. Two shuffles total.
# ---------------------------------------------------------------------------
_MIN_WORDS = 30
_MAX_TOP_WORD_FRAC = 0.25


@register(
    "corpus_prep_pipeline",
    rf"""
    WITH c AS (
      SELECT doc_id, lang,
             trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS clean
      FROM documents
    ), toks AS (
      SELECT doc_id, lang, clean,
             list_filter(string_split(clean, ' '), x -> length(x) > 0) AS t
      FROM c
    ), wc AS (
      SELECT doc_id, unnest(t) AS w FROM toks
    ), wstats AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
             CAST(max(c) AS DOUBLE) / sum(c) AS top_word_frac
      FROM (SELECT doc_id, w, count(*) AS c FROM wc GROUP BY doc_id, w)
      GROUP BY doc_id
    ), gated AS (
      SELECT toks.doc_id, lang, clean, n_words
      FROM toks JOIN wstats ON toks.doc_id = wstats.doc_id
      WHERE n_words >= {_MIN_WORDS} AND top_word_frac <= {_MAX_TOP_WORD_FRAC}
    ), deduped AS (
      SELECT md5(clean) AS clean_md5, min(doc_id) AS keep_doc_id,
             min(lang) AS lang, min(n_words) AS n_words,
             CAST(count(*) AS BIGINT) AS n_copies
      FROM gated GROUP BY md5(clean)
    ), split AS (
      SELECT *,
             CASE WHEN {_sql_md5_u64(f"'{_SPLIT_SALT}' || CAST(keep_doc_id AS VARCHAR)")}
                       % 100 < {TRAIN_PCT}
                  THEN 'train' ELSE 'test' END AS split
      FROM deduped
    )
    SELECT split, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS n_words,
           CAST(sum(n_copies) AS BIGINT) AS n_source_docs
    FROM split
    GROUP BY split, lang
    ORDER BY split, lang
    """,
    doc="composed corpus prep: normalize → quality gate → exact dedup → split → rollup",
)
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    clean = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    toks = d.select(
        "doc_id",
        "lang",
        clean.alias("clean"),
        F.filter(F.split(clean, " "), lambda x: F.length(x) > 0).alias("t"),
    )
    wc = toks.select("doc_id", F.explode("t").alias("w"))
    wstats = (
        wc.groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_words"),
            (F.max("c").cast("double") / F.sum("c")).alias("top_word_frac"),
        )
    )
    gated = (
        toks.join(wstats, "doc_id")
        .filter(
            (F.col("n_words") >= _MIN_WORDS)
            & (F.col("top_word_frac") <= _MAX_TOP_WORD_FRAC)
        )
        .select("doc_id", "lang", "clean", "n_words")
    )
    deduped = gated.groupBy(F.md5("clean").alias("clean_md5")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.min("lang").alias("lang"),
        F.min("n_words").alias("n_words"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    bucket = F.pmod(
        _md5_u64(F.concat(F.lit(_SPLIT_SALT), F.col("keep_doc_id").cast("string"))),
        F.lit(100),
    )
    split = F.when(bucket < TRAIN_PCT, F.lit("train")).otherwise(F.lit("test"))
    return (
        deduped.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_copies").alias("n_source_docs"),
        )
        .orderBy("split", "lang")
    )


#: every 20th doc plays the held-out benchmark; the rest is the
#: training pool to be decontaminated against it
_BENCH_MOD = 20
_DECON_N = 5  # word n-gram width


@register(
    "decontaminate_ngram_overlap",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
               AS gram
      FROM toks
      CROSS JOIN (SELECT unnest(generate_series(1, 100000)) AS i) ii
      WHERE i <= len(t) - {_DECON_N - 1}
    ), bench AS (
      SELECT doc_id, gram FROM sh WHERE doc_id % {_BENCH_MOD} = 0
    ), train AS (
      SELECT doc_id, gram FROM sh WHERE doc_id % {_BENCH_MOD} <> 0
    ), hits AS (
      SELECT t.doc_id,
             CAST(count(DISTINCT t.gram) AS BIGINT) AS n_shared_grams,
             CAST(count(DISTINCT b.doc_id) AS BIGINT) AS n_bench_docs
      FROM train t JOIN bench b ON t.gram = b.gram
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_shared_grams, n_bench_docs
    FROM hits
    ORDER BY doc_id
    """,
    doc=f"decontamination: training docs sharing a word {_DECON_N}-gram with the benchmark slice",
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # token array materialized pre-lambda (HOF bodies re-evaluate per
    # element — see queries/llm.py minhash_signatures note)
    toks = F.col("_toks")
    n = F.size(toks)
    idxs = F.sequence(F.lit(1), F.greatest(n - (_DECON_N - 1), F.lit(0)))
    grams = F.array_distinct(
        F.transform(
            idxs,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + k) for k in range(_DECON_N)]
            ),
        )
    )
    sh = (
        d.withColumn("_toks", F.split("text", " "))
        .select("doc_id", F.explode(grams).alias("gram"))
    )
    bench = sh.filter(F.col("doc_id") % _BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), "gram"
    )
    train = sh.filter(F.col("doc_id") % _BENCH_MOD != 0)
    return (
        train.join(bench, "gram")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("gram").alias("n_shared_grams"),
            F.count_distinct("bench_id").alias("n_bench_docs"),
        )
        .orderBy("doc_id")
    )
