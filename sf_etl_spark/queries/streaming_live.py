"""Registry entries that exercise the REAL Structured Streaming path
(readStream → stateful plan → availableNow → memory sink), not just
the batch twins in streaming_batch.py.

Each entry stages the bounded ``events`` table as an ordered chunked
file stream, replays it through the streaming plan, and returns the
materialized result — so the driver's oracle gate verifies actual
replay semantics (micro-batch state merge, watermark dedup, custom
state) rather than only the shared window operators.

Session tz is pinned to UTC inside each entry: watermark columns must
be TIMESTAMP (LTZ), and UTC makes the LTZ↔NTZ round trip
value-preserving so results hash-match the NTZ-based oracle.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sf_etl_spark.queries import register


def _stage(spark: SparkSession, sf_dir: str, duplicate: bool = False) -> str:
    from sf_etl_spark.streaming import stage_events_as_stream_source

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = tempfile.mkdtemp(prefix="stream_src_")
    return stage_events_as_stream_source(spark, sf_dir, out, n_chunks=4, duplicate=duplicate)


@register(
    "stream_tumbling_1h",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT)           AS n_events,
           CAST(CAST(sum(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    doc="REAL readStream replay of the 1h tumbling agg (complete mode)",
)
def stream_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sf_etl_spark.streaming import events_stream, run_to_memory_table, stream_tumbling_agg

    src = _stage(spark, sf_dir)
    name, _ = run_to_memory_table(
        stream_tumbling_agg(events_stream(spark, src)),
        output_mode="complete",
        shuffle_partitions=8,  # fixture state is (type, hour)-bounded
    )
    return (
        spark.table(name)
        .withColumn("window_start", F.col("window_start").cast("timestamp_ntz"))
        .orderBy("window_start", "event_type")
    )


@register(
    "stream_dedup_exactly_once",
    """
    SELECT event_id FROM events ORDER BY event_id
    """,
    doc="dropDuplicatesWithinWatermark under duplicated at-least-once replay",
)
def stream_dedup_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sf_etl_spark.streaming import (
        events_stream,
        run_to_memory_table,
        stream_dedup_within_watermark,
    )

    src = _stage(spark, sf_dir, duplicate=True)
    name, _ = run_to_memory_table(
        stream_dedup_within_watermark(events_stream(spark, src)),
        output_mode="append",
        shuffle_partitions=8,  # dedup state ~ event ids in watermark
    )
    return spark.table(name).select("event_id").orderBy("event_id")


@register(
    "stream_stream_join_attribution",
    """
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS gap_seconds
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 30 MINUTE
    ORDER BY click_id, purchase_id
    """,
    doc="REAL stream-stream interval join (watermarked both sides, state-pruned)",
)
def stream_stream_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sf_etl_spark.streaming import (
        events_stream,
        run_to_memory_table,
        stream_click_attribution,
    )

    src = _stage(spark, sf_dir)
    clicks = events_stream(spark, src).filter(F.col("event_type") == "click")
    purchases = events_stream(spark, src).filter(F.col("event_type") == "purchase")
    name, _ = run_to_memory_table(
        stream_click_attribution(clicks, purchases),
        output_mode="append",
        shuffle_partitions=8,  # join state ~ clicks in 30min horizon
    )
    return spark.table(name).orderBy("click_id", "purchase_id")


@register(
    "stream_stateful_user_agg",
    """
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    doc="applyInPandasWithState running per-user counts; final state vs batch agg",
)
def stream_stateful_user_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sf_etl_spark.streaming import (
        events_stream,
        run_to_memory_table,
        stream_stateful_user_counts,
    )

    src = _stage(spark, sf_dir)
    name, _ = run_to_memory_table(
        stream_stateful_user_counts(events_stream(spark, src)),
        output_mode="update",
        shuffle_partitions=8,  # per-user count state, fixture users
    )
    # counts are monotone across updates → max is the final state
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .orderBy("user_id")
    )
