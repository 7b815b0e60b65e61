"""Gopher §A1.1 repetition battery on a crafted corpus (r14 verdict
task 2): the 13 published repetition rules — duplicate line/paragraph
fractions by count and by character share, top-2/3/4-gram character
fractions, dup-5..10-gram character fractions — each FIRE on exactly
one hand-built document and PASS on the rest, with the expected
verdicts hand-computed (arithmetic in the comments). The same corpus
runs through the lane's DuckDB oracle SQL AND a ~40-line pure-Python
reference implementation, closing the triangle twice over:
hand-computed == Spark report == DuckDB report == Python reference.

Semantics under test (documented at `gopher_repetition_report`):
- lines = split(text, '\\n'); paras = regex-split on '\\n{2,}';
  words = split(text, ' ') — empty strings kept, like the engines;
- tl = max(length(text), 1) is the denominator of EVERY char fraction;
- dup_line_frac = (n_lines - n_distinct_lines) / n_lines; char twin
  sums (count-1)*len over line values occurring >= 2 times (excess
  occurrences — the first copy is not a duplicate); same for paras;
- top-n-gram (n=2,3,4): grams join n consecutive words with ' ';
  mass = max_count * max(len among grams at max_count) when
  max_count >= 2 else 0; frac = mass / tl;
- dup-n-gram (n=5..10): word positions covered by ANY occurrence of
  a gram seen >= 2 times; covered chars = sum of word lengths over
  the covered positions (spaces never counted); frac = covered / tl;
- a rule FAILS when its fraction exceeds the published threshold
  (0.30/0.20 lines, 0.30/0.20 paras, 0.20/0.18/0.16 top-grams,
  0.15..0.10 dup-grams).
"""

from __future__ import annotations

import os
import re
from collections import Counter

import duckdb
import pytest

THRESH = {
    "n_fail_dup_line": 0.30,
    "n_fail_dup_line_char": 0.20,
    "n_fail_dup_para": 0.30,
    "n_fail_dup_para_char": 0.20,
    "n_fail_top_2gram": 0.20,
    "n_fail_top_3gram": 0.18,
    "n_fail_top_4gram": 0.16,
    "n_fail_dup_5gram": 0.15,
    "n_fail_dup_6gram": 0.14,
    "n_fail_dup_7gram": 0.13,
    "n_fail_dup_8gram": 0.12,
    "n_fail_dup_9gram": 0.11,
    "n_fail_dup_10gram": 0.10,
}
FAIL_COLS = list(THRESH)


def _docs() -> list[tuple[int, str, str]]:
    docs = []
    # r_dupline: lines [x, x, x, L*30] -> dup lines (4-2)/4 = 0.5 > 0.3
    # fails dup_line ONLY (dup chars (3-1)*1 = 2, tl 36 -> 0.056; no
    # spaces -> one word -> no n-grams; one paragraph)
    docs.append((1, "r_dupline", "x\nx\nx\n" + "L" * 30))
    # r_duplinechar: a 40-char line twice + 8 unique 1-char lines ->
    # dup lines 1/10 = 0.1 passes; dup chars (2-1)*40 = 40, tl 97
    # (88 line chars + 9 newlines) -> 0.412 > 0.2 fails char twin ONLY
    docs.append(
        (2, "r_duplinechar", "\n".join(["Q" * 40, "Q" * 40] + list("abcdefgh")))
    )
    # r_duppara: paragraph "ab\ncd" twice + an 8-line unique tail para
    # -> dup paras (3-2)/3 = 0.333 > 0.3 fails dup_para ONLY (para
    # chars (2-1)*5 = 5 / tl 53 = 0.094; lines: ab,cd twice + two ''
    # separators + 8 uniques = 14, distinct 11 -> 3/14 = 0.214 passes)
    tailp = "\n".join("u" + str(i) * 3 for i in range(8))
    docs.append((3, "r_duppara", "ab\ncd\n\nab\ncd\n\n" + tailp))
    # r_dupparachar: a 100-char paragraph twice among 6 unique 3-line
    # paras -> dup paras 1/8 = 0.125 passes but char share 100/370 =
    # 0.270 > 0.2 fails BOTH char twins (a duplicated single-line
    # paragraph is also a duplicated line — the count rules still
    # pass: lines 27 total/20 distinct -> 7/27 = 0.259 <= 0.3)
    uniq = ["\n".join(f"p{i}l{j}xxxx" for j in range(3)) for i in range(6)]
    docs.append((4, "r_dupparachar", "\n\n".join(["Z" * 100, "Z" * 100] + uniq)))
    # r_top2: "xq zr" x3 never adjacent -> mass 3*5 = 15 / tl 26 =
    # 0.577 > 0.2 fails top_2gram ONLY (no repeated 3-gram: distinct
    # u1/u2/u3 contexts)
    docs.append((5, "r_top2", "xq zr u1 xq zr u2 xq zr u3"))
    # r_top3: "xq zr ws" x3 with unique 16-char fillers -> top3 mass
    # 3*8 = 24 / tl 77 = 0.312 > 0.18 fails; the contained 2-grams
    # ("xq zr", "zr ws") have mass 3*5 = 15 / 77 = 0.195 <= 0.2 pass
    f3 = ["F" * 16, "G" * 16, "H" * 16]
    docs.append(
        (6, "r_top3", " ".join(sum([["xq", "zr", "ws", x] for x in f3], [])))
    )
    # r_top4: "aa bb cc dd" x3 with unique 44-char fillers -> top4
    # mass 3*11 = 33 / tl 170 = 0.194 > 0.16 fails; top3 3*8 = 24/170
    # = 0.141 <= 0.18 and top2 15/170 = 0.088 pass
    f4 = ["I" * 44, "J" * 44, "K" * 44]
    docs.append(
        (7, "r_top4", " ".join(sum([["aa", "bb", "cc", "dd", x] for x in f4], [])))
    )
    # r_dup5: a 5-gram of 4-char words twice, 11-char unique fillers ->
    # coverage 10 words * 4 = 40 / tl 241 = 0.166 > 0.15 fails
    # dup_5gram ONLY (no repeated 6-gram: different continuations ->
    # dup6..10 coverage 0; top4 mass 2*19 = 38/241 = 0.158 <= 0.16)
    g5 = ["abcd", "bcde", "cdef", "defg", "efgh"]
    fill = ["u%02dxxxxxxxx" % i for i in range(16)]
    docs.append((8, "r_dup5", " ".join(g5 + fill[:8] + g5 + fill[8:])))
    # r_dup10: a 10-gram of 2-char words twice, 9-char fillers -> the
    # repeated 10-gram induces repeated 5..9-grams COVERING THE SAME
    # 20 positions, so every dup-n coverage is 40/379 = 0.1055 — above
    # only the 10-gram threshold (0.10): fails dup_10gram ONLY
    g10 = ["w%d" % i for i in range(10)]
    filler = ["f%02dxxxxxx" % i for i in range(32)]
    docs.append((9, "r_dup10", " ".join(g10 + filler[:16] + g10 + filler[16:])))
    # r_good: mild repetition everywhere, all 13 rules pass (top2
    # "the cat" x2 -> 14/191 = 0.073)
    docs.append(
        (10, "r_good",
         "the cat sat\n\non the mat and the cat ran to the hill "
         + " ".join("word%02d" % i for i in range(20)))
    )
    return docs


# lang -> (fail columns expected at 1, n_kept)
EXPECTED = {
    "r_dupline": (["n_fail_dup_line"], 0),
    "r_duplinechar": (["n_fail_dup_line_char"], 0),
    "r_duppara": (["n_fail_dup_para"], 0),
    "r_dupparachar": (["n_fail_dup_line_char", "n_fail_dup_para_char"], 0),
    "r_top2": (["n_fail_top_2gram"], 0),
    "r_top3": (["n_fail_top_3gram"], 0),
    "r_top4": (["n_fail_top_4gram"], 0),
    "r_dup5": (["n_fail_dup_5gram"], 0),
    "r_dup10": (["n_fail_dup_10gram"], 0),
    "r_good": ([], 1),
}


def _ref_fractions(text: str) -> dict[str, float]:
    """Pure-Python reference of the documented semantics — the third
    leg of the triangle (hand-computed == Spark == DuckDB == this)."""
    tl = max(len(text), 1)
    lines = text.split("\n")
    paras = re.split(r"\n{2,}", text)
    words = text.split(" ")
    out = {}

    def dup(elems):
        c = Counter(elems)
        return (
            len(elems) - len(c),
            sum((k - 1) * len(e) for e, k in c.items() if k >= 2),
        )

    dn, dc = dup(lines)
    out["n_fail_dup_line"] = dn / len(lines)
    out["n_fail_dup_line_char"] = dc / tl
    dn, dc = dup(paras)
    out["n_fail_dup_para"] = dn / len(paras)
    out["n_fail_dup_para_char"] = dc / tl
    for n in (2, 3, 4):
        c = Counter(
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        )
        mc = max(c.values(), default=0)
        mass = mc * max((len(g) for g, k in c.items() if k == mc), default=0)
        out[f"n_fail_top_{n}gram"] = (mass if mc >= 2 else 0) / tl
    for n in range(5, 11):
        grams = [(i, " ".join(words[i : i + n])) for i in range(len(words) - n + 1)]
        c = Counter(g for _, g in grams)
        covered: set[int] = set()
        for i, g in grams:
            if c[g] >= 2:
                covered.update(range(i, i + n))
        out[f"n_fail_dup_{n}gram"] = sum(len(words[j]) for j in covered) / tl
    return out


def _check(rows: list[dict]) -> None:
    assert len(rows) == len(EXPECTED)
    for r in rows:
        fails, kept = EXPECTED[r["lang"]]
        assert r["n_docs"] == 1, r
        assert r["n_kept"] == kept, r
        for col in FAIL_COLS:
            want = 1 if col in fails else 0
            assert r[col] == want, (r["lang"], col, r)


def test_reference_agrees_with_hand_computation():
    """The pure-Python reference reproduces the hand-computed verdict
    table — anchors the other two engines' checks to the arithmetic
    in the _docs() comments."""
    for _, lang, text in _docs():
        fr = _ref_fractions(text)
        fails = sorted(c for c in FAIL_COLS if fr[c] > THRESH[c])
        assert fails == sorted(EXPECTED[lang][0]), (lang, fr)


@pytest.fixture(scope="module")
def crafted(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("rep_docs")
    df = spark.createDataFrame(_docs(), "doc_id int, lang string, text string")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return df, str(d)


def test_repetition_rules_fire_as_hand_computed(spark, crafted):
    from sf_etl_spark.queries.llm import gopher_repetition_report

    df, _ = crafted
    rows = [r.asDict() for r in gopher_repetition_report(df).collect()]
    _check(rows)


def test_repetition_oracle_agrees_on_crafted_corpus(spark, crafted):
    """The lane's DuckDB oracle computes the same report on the
    crafted corpus — every rule cross-engine-verified where it
    actually discriminates."""
    from sf_etl_spark.queries import all_queries

    _, d = crafted
    oracle = all_queries()["quality_gopher_repetition"].oracle
    con = duckdb.connect()
    glob = os.path.join(d, "documents.parquet", "*.parquet").replace("'", "''")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    cols = [c[0] for c in con.execute(oracle).description]
    rows = [dict(zip(cols, r)) for r in con.execute(oracle).fetchall()]
    _check(rows)
