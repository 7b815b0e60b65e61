"""Edge-case unit tests for the training-data lanes that the parquet
fixtures can't exercise (their docs all have >= 10 tokens)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def short_doc_dir(spark, tmp_path_factory):
    """A documents table whose docs are SHORTER than the 5-token
    decontamination n-gram — plus one long doc pair so the join has
    something real to find."""
    base = str(tmp_path_factory.mktemp("shortdocs"))
    long = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, "one", "en", "web", 3),            # 1 token, bench slice (0 % 20 == 0)
        (1, "just two", "en", "web", 8),       # 2 tokens
        (2, "a b c d", "en", "web", 7),        # 4 tokens — sequence(1, 0) trap
        (20, long, "en", "web", len(long)),    # bench doc (20 % 20 == 0)
        (21, long + " extra", "en", "web", 1), # train doc sharing 5-grams
    ]
    # load_table reads <dir>/documents.parquet — a directory by that
    # name is a normal multi-file parquet dataset to Spark
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(base + "/documents.parquet")
    return base


def test_decontaminate_survives_short_docs(spark, short_doc_dir):
    from sf_etl_spark.queries.training_data import decontaminate_ngram_overlap

    rows = decontaminate_ngram_overlap(spark, short_doc_dir).collect()
    # only doc 21 shares a 5-gram with the benchmark slice; the short
    # docs neither crash the gram builder nor appear in the report
    assert [(r["doc_id"], r["n_bench_docs"]) for r in rows] == [(21, 1)]
    assert rows[0]["n_shared_grams"] == 4  # 8-token overlap -> 4 shared 5-grams


def test_shingle_lanes_survive_short_docs(spark, short_doc_dir):
    """The same sequence(1,0) trap existed in every window/shingle
    builder; docs below the window width must vanish, not crash."""
    from sf_etl_spark.queries.llm import (
        dedup_minhash_lsh,
        doc_fingerprint,
        ngram_jaccard_pairs,
    )

    pairs = {(r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(spark, short_doc_dir).collect()}
    assert (20, 21) in pairs and all(a >= 20 for a, _ in pairs)

    mh = {(r["doc_a"], r["doc_b"]) for r in dedup_minhash_lsh(spark, short_doc_dir).collect()}
    assert mh <= {(20, 21)}  # short docs have no signature at all

    fp = {r["doc_id"] for r in doc_fingerprint(spark, short_doc_dir).collect()}
    assert fp == {0, 1, 2, 20, 21}  # short docs keep a row (null/0 windows), no crash
