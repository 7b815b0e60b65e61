"""Published-preset Gopher rules on a crafted corpus (r13 verdict
task 5): the fixture corpus has no symbols/bullets/ellipses/newlines,
so the structural rules pass trivially there — here every rule FIRES
on a hand-built document, and the expected verdicts are hand-computed
(the arithmetic is in the comments). The same crafted corpus is also
run through the lane's DuckDB oracle SQL, closing the triangle:
hand-computed == Spark report == DuckDB report.
"""

from __future__ import annotations

import os

import duckdb
import pytest

# one lang per document so each report row isolates one document's
# verdicts; text is built so exactly the TARGET rule (plus any noted
# side effect) fails
STOP8 = "the be to of and that have with"  # 8 words, 24 chars


def _docs() -> list[tuple[int, str, str]]:
    docs = []
    # d_good: 8 stopwords + 52x"hello" = 60 words, 284 chars ->
    # mwl 4.73, no structure -> ALL rules pass
    docs.append((1, "d_good", STOP8 + " " + " ".join(["hello"] * 52)))
    # d_short: 4 words -> fails length ONLY (mwl 3.75, 2 stopwords)
    docs.append((2, "d_short", "hello world the of"))
    # d_symbols: d_good + 7 '#' words -> 67 words, 7 symbols,
    # 7/67 = 0.1045 > 0.1 -> fails symbol ONLY (alpha 60/67 = 0.896,
    # mwl 291/67 = 4.34)
    docs.append(
        (3, "d_symbols", STOP8 + " " + " ".join(["hello"] * 52 + ["#"] * 7))
    )
    # d_bullets: 10 lines, each '- ' + the 8 stopwords + 2 hellos
    # (11 space-tokens per line; 9 line joins merge 'hello\n-' into
    # one token -> 101 words, 100 alpha -> 0.99; chars 350+9 newlines
    # -> mwl 3.55); 10/10 bullet lines > 0.9 -> fails bullet ONLY
    line = "- " + STOP8 + " hello hello"
    docs.append((4, "d_bullets", "\n".join([line] * 10)))
    # d_ellipsis: 10 lines (6-token each; 51 words after 9 joins),
    # line 1 = 6 stopwords, lines 4-6 end '...', line 10 ends the
    # unicode ellipsis -> 4/10 = 0.4 > 0.3 fails ellipsis ONLY
    # (symbols 3 + 1 = 4, 4/51 = 0.078 <= 0.1 passes symbol; the
    # final lone unicode-ellipsis token is the only non-alpha word ->
    # 50/51 = 0.98)
    a = " ".join(["hello"] * 6)
    b = " ".join(["hello"] * 5) + " ..."
    c = " ".join(["hello"] * 5) + " …"
    stop_line = " ".join(STOP8.split()[:6])
    docs.append(
        (5, "d_ellipsis", "\n".join([stop_line, a, a, b, b, b, a, a, a, c]))
    )
    # d_alpha: 8 stopwords + 37 hello + 15 '123' = 60 words,
    # alpha 45/60 = 0.75 < 0.8 -> fails alpha ONLY (mwl 254/60 = 4.23)
    docs.append(
        (6, "d_alpha", STOP8 + " " + " ".join(["hello"] * 37 + ["123"] * 15))
    )
    # d_stop: 59 hello + 'the' = 60 words, 1 distinct stopword < 2 ->
    # fails stopword ONLY
    docs.append((7, "d_stop", " ".join(["hello"] * 59 + ["the"])))
    # d_wordlen: 60 x 2-char words -> mwl 2.0 < 3 fails word_len;
    # 0 stopwords -> also fails stopword (noted side effect)
    docs.append((8, "d_wordlen", " ".join(["ab"] * 60)))
    return docs


# lang -> (which fail columns are 1, kept)
EXPECTED = {
    "d_good": ([], 1),
    "d_short": (["n_fail_length"], 0),
    "d_symbols": (["n_fail_symbol"], 0),
    "d_bullets": (["n_fail_bullet"], 0),
    "d_ellipsis": (["n_fail_ellipsis"], 0),
    "d_alpha": (["n_fail_alpha"], 0),
    "d_stop": (["n_fail_stopword"], 0),
    "d_wordlen": (["n_fail_word_len", "n_fail_stopword"], 0),
}

FAIL_COLS = [
    "n_fail_length",
    "n_fail_word_len",
    "n_fail_symbol",
    "n_fail_bullet",
    "n_fail_ellipsis",
    "n_fail_alpha",
    "n_fail_stopword",
]


def _check(rows: list[dict]) -> None:
    assert len(rows) == len(EXPECTED)
    for r in rows:
        fails, kept = EXPECTED[r["lang"]]
        assert r["n_docs"] == 1, r
        assert r["n_kept"] == kept, r
        for col in FAIL_COLS:
            want = 1 if col in fails else 0
            assert r[col] == want, (r["lang"], col, r)


@pytest.fixture(scope="module")
def crafted(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("gopher_docs")
    df = spark.createDataFrame(_docs(), "doc_id int, lang string, text string")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return df, str(d)


def test_published_rules_fire_as_hand_computed(spark, crafted):
    from sf_etl_spark.queries.llm import gopher_published_report

    df, _ = crafted
    rows = [r.asDict() for r in gopher_published_report(df).collect()]
    _check(rows)


def test_published_oracle_agrees_on_crafted_corpus(spark, crafted):
    """The lane's DuckDB oracle computes the same report on the crafted
    corpus — the structural rules are verified cross-engine where they
    actually discriminate, not just where they trivially pass."""
    from sf_etl_spark.queries import all_queries

    _, d = crafted
    oracle = all_queries()["quality_gopher_published"].oracle
    con = duckdb.connect()
    glob = os.path.join(d, "documents.parquet", "*.parquet").replace("'", "''")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    cols = [c[0] for c in con.execute(oracle).description]
    rows = [dict(zip(cols, r)) for r in con.execute(oracle).fetchall()]
    _check(rows)
