"""Watermark-boundary semantics of the FULL OUTER stream-stream join
(r13 ADVICE): the oracle's purchase-side eviction rule must use the
inequality Spark's state-removal predicate actually applies at
``purchase_ts == watermark``.

The provable semantics (restated in streaming_live.py's oracle):

* CLICK side — a click can match purchases with ``purchase_ts`` in
  ``[click_ts, click_ts + 30m)`` (STRICT upper bound). Once the
  purchase watermark reaches ``click_ts + 30m``, every not-yet-seen
  purchase has ``ts >= click_ts + 30m`` and provably cannot match, so
  eviction at EQUALITY is sound → the oracle's
  ``click_ts + 30m <= wm`` is exact.
* PURCHASE side — a purchase can match clicks with ``click_ts`` in
  ``(purchase_ts - 30m, purchase_ts]`` (INCLUSIVE upper bound). At
  ``click watermark == purchase_ts`` a same-timestamp click is NOT yet
  late (watermarks drop strictly-older rows only), so the purchase is
  not provably unmatched and must stay in state one more beat →
  eviction (and the oracle) must be STRICT: ``purchase_ts < wm``.

These tests build the exact boundary scenario as a two-trigger file
replay: a purchase at T0, both watermarks advanced to exactly T0, then
a same-timestamp click arriving in a LATER trigger. If the purchase
were evicted at equality, the pair could never match and the engine
would emit two null rows where the batch oracle has a match.
"""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from sf_etl_spark.streaming import (
    events_stream,
    run_to_memory_table,
    stream_click_attribution,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)
MIN30 = dt.timedelta(minutes=30)


def _stage_triggers(spark, out_dir: str, *trigger_rows) -> str:
    """Write each row-list as one parquet file with strictly increasing
    mtimes so FileStreamSource replays them as ordered micro-batches
    (one file per trigger via maxFilesPerTrigger=1)."""
    os.makedirs(out_dir, exist_ok=True)
    now = time.time()
    for i, rows in enumerate(trigger_rows):
        df = spark.createDataFrame(
            [
                (eid, ts, uid, etype, 1.0, "{}")
                for (eid, ts, uid, etype) in rows
            ],
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        )
        staging = os.path.join(out_dir, f"_tmp{i}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        src = next(
            f for f in os.listdir(staging) if f.endswith(".parquet")
        )
        dst = os.path.join(out_dir, f"chunk_{i}.parquet")
        os.replace(os.path.join(staging, src), dst)
        os.utime(dst, (now + i, now + i))
        import shutil

        shutil.rmtree(staging)
    return out_dir


def _run_full_outer(spark, src: str):
    clicks = events_stream(spark, src, max_files_per_trigger=1).filter(
        F.col("event_type") == "click"
    )
    purchases = events_stream(spark, src, max_files_per_trigger=1).filter(
        F.col("event_type") == "purchase"
    )
    name, _ = run_to_memory_table(
        stream_click_attribution(clicks, purchases, how="full_outer"),
        output_mode="append",
        shuffle_partitions=2,
    )
    return {
        (r["click_id"], r["purchase_id"])
        for r in spark.table(name).collect()
    }


def test_purchase_survives_watermark_equality_and_matches_late_click(
    spark, tmp_path
):
    """purchase_ts == watermark, same-timestamp click in a LATER
    trigger: the click is not late (watermarks drop strictly-older rows
    only), the purchase must still be in state, and the pair must emit
    as a MATCH — i.e. purchase-side eviction is strict (<), exactly the
    restated oracle rule."""
    src = _stage_triggers(
        spark,
        str(tmp_path / "src"),
        # trigger 1: the boundary purchase P(100) at T0, plus advancer
        # events pushing BOTH per-stream watermarks to exactly T0
        # (global watermark = min(clickmax, purchasemax) - 30m = T0)
        [
            (100, T0, 1, "purchase"),
            (900, T0 + MIN30, 99, "click"),
            (901, T0 + MIN30, 98, "purchase"),
        ],
        # trigger 2: the same-timestamp click C(200) — arrives when
        # wm == T0 == its own event time; must join with P(100)
        [(200, T0, 1, "click")],
        # trigger 3: push both watermarks far past everything so all
        # remaining state evicts and null-emits before availableNow ends
        [
            (902, T0 + 4 * MIN30, 97, "click"),
            (903, T0 + 4 * MIN30, 96, "purchase"),
        ],
    )
    got = _run_full_outer(spark, src)
    # the boundary pair MATCHED (neither a (None, 100) null-emit for
    # the purchase nor a (200, None) one for the click)
    assert (200, 100) in got
    assert (None, 100) not in got
    assert (200, None) not in got


def test_unmatched_purchase_at_exact_final_watermark_is_not_emitted(
    spark, tmp_path
):
    """An unmatched purchase with purchase_ts exactly == the FINAL
    global watermark is NOT null-emitted (eviction is strict); one
    second older, it is. This is the fixture-sensitive boundary the
    r13 oracle wrote as inclusive — pinned here to the strict rule the
    oracle now restates."""
    sec = dt.timedelta(seconds=1)
    src = _stage_triggers(
        spark,
        str(tmp_path / "src"),
        # two orphan purchases, no matching clicks anywhere
        [
            (300, T0, 50, "purchase"),  # exactly AT the final watermark
            (301, T0 - sec, 51, "purchase"),  # strictly below it
        ],
        # final trigger pins both stream maxima at T0 + 30m, so the
        # final global watermark is exactly T0
        [
            (904, T0 + MIN30, 99, "click"),
            (905, T0 + MIN30, 98, "purchase"),
        ],
    )
    got = _run_full_outer(spark, src)
    assert (None, 301) in got  # provably unmatched: below the watermark
    assert (None, 300) not in got  # at the boundary: still in state
    assert (300, None) not in got and (301, None) not in got


def test_unmatched_click_at_exact_horizon_boundary_is_emitted(
    spark, tmp_path
):
    """The CLICK side's inclusive rule is provable: with the purchase
    watermark exactly at click_ts + 30m, the strict horizon upper
    bound makes the click unmatched with certainty, and Spark emits
    its null row at equality — the oracle's `click_ts + 30m <= wm`."""
    src = _stage_triggers(
        spark,
        str(tmp_path / "src"),
        [(400, T0, 60, "click")],  # orphan click, no purchases for user 60
        # final watermarks: click side T0 + 60m, purchase side T0 + 60m
        # → global watermark T0 + 30m == click_ts + 30m exactly
        [
            (906, T0 + 2 * MIN30, 99, "click"),
            (907, T0 + 2 * MIN30, 98, "purchase"),
        ],
    )
    got = _run_full_outer(spark, src)
    assert (400, None) in got
