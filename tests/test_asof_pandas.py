"""Bucketed cogroup as-of join (r15 optimization round): the pandas
lane now cogroups by a hash BUCKET of the key and delegates per-key
matching to ``pd.merge_asof(by=...)`` — one Python crossing per bucket
instead of one per key. These tests pin that the rewrite is
row-identical to the JVM union+window recipe (the repo's reference
semantics) across bucket counts, including the fragile paths: a key
with no right rows, a globally empty right side, and left rows earlier
than every right row."""

from __future__ import annotations

import datetime as dt

from sf_etl_spark.operators.joins import asof_join, asof_join_pandas


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _fixture(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts(5)),   # before any click of user 10
            (2, 10, _ts(9)),   # after 08:00 click
            (3, 10, _ts(12)),  # after 11:00 click
            (4, 20, _ts(9)),   # exactly at a click ts (inclusive match)
            (5, 30, _ts(9)),   # user with NO right rows at all
        ],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts(8), 1.5),
            (10, _ts(11), 2.5),
            (20, _ts(9), 7.0),
            (40, _ts(1), 9.0),  # right-only key: must not leak
        ],
        "user_id int, ts timestamp, value double",
    )
    return left, right


def _rows(df):
    return sorted(
        (r["event_id"], r["user_id"], r["ts"], r["asof_ts"], r["asof_value"])
        for r in df.collect()
    )


def test_bucketed_matches_jvm_recipe_across_bucket_counts(spark):
    left, right = _fixture(spark)
    want = _rows(
        asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts", right_payload=["value"])
    )
    for buckets in (1, 2, 7, None):  # incl. every key in ONE bucket and the adaptive default
        got = _rows(
            asof_join_pandas(
                left, right, on="user_id", left_ts="ts", right_ts="ts",
                right_payload=["value"], buckets=buckets,
            )
        )
        assert got == want, f"buckets={buckets}"
    # sanity on the semantics themselves, not just recipe agreement
    by_id = {r[0]: r for r in want}
    assert by_id[1][4] is None          # earlier than every click
    assert by_id[2][4] == 1.5           # backward match
    assert by_id[3][4] == 2.5           # latest preceding click
    assert by_id[4][4] == 7.0           # inclusive (ts equal) match
    assert by_id[5][4] is None          # keyless user stays unmatched


def test_bucketed_empty_right_side(spark):
    left, right = _fixture(spark)
    empty_right = right.filter("user_id < 0")
    got = _rows(
        asof_join_pandas(
            left, empty_right, on="user_id", left_ts="ts", right_ts="ts",
            right_payload=["value"], buckets=4,
        )
    )
    assert [g[:3] for g in got] == [
        (r["event_id"], r["user_id"], r["ts"]) for r in left.orderBy("event_id").collect()
    ]
    assert all(g[3] is None and g[4] is None for g in got)


def test_null_join_keys_match_jvm_recipe(spark):
    """NULL join keys ride the reserved bucket and keep the pre-
    bucketing semantics (the JVM window recipe groups nulls together
    too); a bucket mixing null and non-null int keys must not crash
    pandas on a by-column dtype mismatch."""
    left = spark.createDataFrame(
        [(1, None, _ts(9)), (2, 10, _ts(9)), (3, None, _ts(5))],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(None, _ts(8), 3.5), (10, _ts(8), 1.5)],
        "user_id int, ts timestamp, value double",
    )
    want = _rows(
        asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts", right_payload=["value"])
    )
    for buckets in (1, 4):
        got = _rows(
            asof_join_pandas(
                left, right, on="user_id", left_ts="ts", right_ts="ts",
                right_payload=["value"], buckets=buckets,
            )
        )
        assert got == want, f"buckets={buckets}"
    by_id = {r[0]: r for r in want}
    assert by_id[1][4] == 3.5   # null left key matches the null-key right row
    assert by_id[2][4] == 1.5   # non-null key unaffected
    assert by_id[3][4] is None  # null key, before the null right row


def test_reserved_bucket_column_collision_raises(spark):
    """'_bkt' on the left side would be silently overwritten with
    internal bucket ids and come back corrupted via out_cols (r15
    ADVICE) — refuse it up front."""
    import pytest

    left, right = _fixture(spark)
    with pytest.raises(ValueError, match="_bkt"):
        asof_join_pandas(
            left.withColumn("_bkt", left.event_id), right,
            on="user_id", left_ts="ts", right_ts="ts", right_payload=["value"],
        )
    with pytest.raises(ValueError, match="buckets"):
        asof_join_pandas(
            left, right, on="user_id", left_ts="ts", right_ts="ts",
            right_payload=["value"], buckets=0,
        )


def test_max_rows_per_bucket_guard(spark):
    """The per-bucket row budget (r15 verdict: the bucketed cogroup's
    memory contract is O(rows/buckets)) fails fast with sizing advice
    on a pathological rows/buckets ratio, and passes untouched when
    the budget holds."""
    import pytest

    left, right = _fixture(spark)
    kw = dict(on="user_id", left_ts="ts", right_ts="ts", right_payload=["value"])
    # everything in one bucket, budget of 2 rows -> must raise in the worker
    with pytest.raises(Exception, match="max_rows_per_bucket"):
        asof_join_pandas(
            left, right, buckets=1, max_rows_per_bucket=2, **kw
        ).collect()
    # generous budget: identical rows to the unguarded path
    want = _rows(asof_join_pandas(left, right, buckets=4, **kw))
    got = _rows(
        asof_join_pandas(left, right, buckets=4, max_rows_per_bucket=1000, **kw)
    )
    assert got == want
