"""Time-series / event queries — the batch-checkable core of the
streaming surface (SURVEY.md §2.2 "Streaming" row).

Every windowed aggregation here uses the exact operators Structured
Streaming uses (`F.window`, `F.session_window`); running them on a
bounded DataFrame makes them oracle-checkable, and
`sf_etl_spark.streaming` reuses the same plans under `readStream` with
watermarks (tested in tests/test_streaming.py — stateful pieces are
not SQL-expressible, so they stay out of the oracle gate).

The as-of and range joins use the scale recipes from
operators/joins.py: one equi-shuffle, no unbounded cross products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sf_etl_spark.operators.joins import asof_join, range_join_buckets
from sf_etl_spark.queries import register
from sf_etl_spark.sources import load_table


# ---------------------------------------------------------------------------
# Tumbling window aggregation.
# ---------------------------------------------------------------------------
@register(
    "window_tumbling",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT)           AS n_events,
           CAST(CAST(sum(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    doc="tumbling 1h window agg (streaming-identical operator, batch mode)",
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,10)")).cast("string").cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# Sliding window aggregation (1h window, 30m slide → every event in 2
# windows). Oracle expands the membership explicitly.
# ---------------------------------------------------------------------------
@register(
    "window_sliding",
    """
    SELECT window_start, CAST(count(*) AS BIGINT) AS n_events,
           CAST(CAST(sum(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM (
      SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
               AS window_start,
             value
      FROM events
    )
    GROUP BY window_start
    ORDER BY window_start
    """,
    doc="sliding window (1h size / 30m slide) agg",
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,10)")).cast("string").cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


# ---------------------------------------------------------------------------
# Session windows (5-minute inactivity gap) — gaps-and-islands in the
# oracle; `F.session_window` (the streaming-stateful operator) in the
# engine. Spark's session spans [first_ts, last_ts + gap).
# ---------------------------------------------------------------------------
@register(
    "window_session",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '5 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           min(ts)                         AS session_start,
           max(ts) + INTERVAL '5 minutes'  AS session_end,
           CAST(count(*) AS BIGINT)        AS n_events,
           CAST(CAST(sum(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    doc="session windows (5m gap): session_window ↔ gaps-and-islands oracle",
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,10)")).cast("string").cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


# ---------------------------------------------------------------------------
# As-of join: each purchase matched to the user's most recent prior
# (or simultaneous) click. Oracle uses DuckDB's native ASOF JOIN.
# ---------------------------------------------------------------------------
@register(
    "asof_purchase_click",
    """
    SELECT p.event_id, p.user_id, p.ts,
           c.ts    AS asof_ts,
           c.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
    doc="as-of join via union+window recipe (one shuffle, no row blowup)",
)
def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts", right_payload=["value"]
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "asof_ts",
        F.col("asof_value").alias("click_value"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Bounded range (interval) join: follow-on events within 10 minutes of
# an error by the same user, via the bucketed-equi-join recipe.
# ---------------------------------------------------------------------------
@register(
    "range_join_followups",
    """
    SELECT e1.event_id AS error_id,
           CAST(count(*) AS BIGINT) AS n_followups,
           CAST(CAST(sum(CAST(e2.value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS followup_value
    FROM (SELECT * FROM events WHERE event_type = 'error') e1
    JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts >  e1.ts
     AND e2.ts <= e1.ts + INTERVAL '10 minutes'
    GROUP BY e1.event_id
    ORDER BY error_id
    """,
    doc="interval join (0,10m] via bucketed equi-join; no unbounded cross product",
)
def range_join_followups(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    all_ev = e.select("user_id", F.col("ts").alias("ts2"), "value")
    pairs = range_join_buckets(
        errors,
        all_ev,
        on="user_id",
        left_ts="ts",
        right_ts="ts2",
        lower=F.expr("INTERVAL 0 SECOND"),
        upper=F.expr("INTERVAL 10 MINUTE"),
        bucket_seconds=600,
    )
    return (
        pairs.groupBy(F.col("event_id").alias("error_id"))
        .agg(
            F.count(F.lit(1)).alias("n_followups"),
            F.sum(F.col("value").cast("decimal(38,10)")).cast("string").cast("double").alias("followup_value"),
        )
        .orderBy("error_id")
    )


# ---------------------------------------------------------------------------
# Same as-of semantics through the Arrow/pandas lane: cogrouped
# applyInPandas + pd.merge_asof, oracle-matched against DuckDB's
# native ASOF JOIN — proving the two implementations (union+window
# and merge_asof) agree row-for-row.
# ---------------------------------------------------------------------------
@register(
    "asof_pandas_merge",
    """
    SELECT p.event_id, p.user_id, p.ts,
           c.ts    AS asof_ts,
           c.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
    doc="as-of join via cogrouped applyInPandas merge_asof (Arrow lane)",
)
def asof_pandas_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sf_etl_spark.operators.joins import asof_join_pandas

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join_pandas(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts", right_payload=["value"]
    )
    return joined.select(
        "event_id", "user_id", "ts", "asof_ts", F.col("asof_value").alias("click_value")
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Time-series resample + gap-fill: per-user hourly grid with forward
# fill — the "regularize irregular events" operator every metrics
# pipeline needs before rolling computations. Scale: the per-user-hour
# downsample is one hash agg (row_number picks the last event per
# bucket); the grid is sequence+explode bounded by each user's own
# span (never the global span); the forward fill is one window pass
# ordered by bucket. Three shuffles total, all on user_id.
# ---------------------------------------------------------------------------
@register(
    "events_hourly_ffill",
    """
    WITH hourly AS (
      SELECT user_id, hr, value FROM (
        SELECT user_id, date_trunc('hour', ts) AS hr, value,
               row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ),
    spans AS (SELECT user_id, min(hr) AS h0, max(hr) AS h1 FROM hourly GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
      FROM spans
    )
    SELECT g.user_id, g.hr,
           last_value(h.value IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
           h.value IS NOT NULL AS had_event
    FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hr = h.hr
    ORDER BY g.user_id, g.hr
    """,
    doc="per-user hourly resample + forward fill (gap-free time-series grid)",
)
def events_hourly_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    hr = F.date_trunc("hour", F.col("ts"))
    pick_last = W.partitionBy("user_id", "hr").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    hourly = (
        e.select("user_id", hr.alias("hr"), "value", "ts", "event_id")
        .withColumn("rn", F.row_number().over(pick_last))
        .filter(F.col("rn") == 1)
        .select("user_id", "hr", "value")
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
        .select(
            "user_id",
            F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hr"),
        )
    )
    ffill = W.partitionBy("user_id").orderBy("hr").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        grid.join(hourly, ["user_id", "hr"], "left")
        .select(
            "user_id",
            "hr",
            F.last("value", ignorenulls=True).over(ffill).alias("value_ffill"),
            F.col("value").isNotNull().alias("had_event"),
        )
        .orderBy("user_id", "hr")
    )


# ---------------------------------------------------------------------------
# Funnel conversion: how many users progressed view -> click ->
# purchase IN ORDER (each stage strictly after the previous stage's
# first occurrence — not mere co-occurrence). Scale: one conditional
# min-aggregate per stage, every shuffle on user_id so the exchanges
# align stage over stage; no window over unbounded history, no
# self-join of the raw event log against itself (each stage joins
# the previous stage's 1-row-per-user aggregate).
# ---------------------------------------------------------------------------
@register(
    "funnel_conversion",
    """
    WITH ew AS (
      SELECT user_id, ts, event_type FROM events
      WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
    ),
    v AS (
      SELECT user_id, min(ts) AS t1 FROM ew
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM ew e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM ew e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT stage, n_users FROM (
      SELECT 'l1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
      UNION ALL SELECT 'l2_click', CAST(count(*) AS BIGINT) FROM c
      UNION ALL SELECT 'l3_purchase', CAST(count(*) AS BIGINT) FROM p
    )
    ORDER BY stage
    """,
    doc="ordered view->click->purchase funnel; per-stage conditional min-aggs on user_id",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    # a bounded observation window keeps the funnel discriminating
    # (over the full fixture span every user reaches every stage)
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp_ntz"))
        .select("user_id", "ts", "event_type")
    )

    def stage_after(prev: DataFrame, prev_ts: str, etype: str, out_ts: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_ts))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_ts))
        )

    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = stage_after(v, "t1", "click", "t2")
    p = stage_after(c, "t2", "purchase", "t3")

    def count_stage(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(label).alias("stage"), "n_users"
        )

    return (
        count_stage(v, "l1_view")
        .unionByName(count_stage(c, "l2_click"))
        .unionByName(count_stage(p, "l3_purchase"))
        .orderBy("stage")
    )


# ---------------------------------------------------------------------------
# Incremental rollup maintenance (hypertable-style continuous agg):
# the events table applied in TWO delta batches must produce the same
# stored rollup as one direct aggregation — the oracle computes that
# direct aggregation, so any double-count, lost combine, or replace-
# instead-of-fold in the maintenance path breaks the value hash.
# ---------------------------------------------------------------------------
@register(
    "rollup_incremental_maintenance",
    """
    SELECT user_id, date_trunc('hour', ts) AS hour,
           CAST(count(*) AS BIGINT) AS n_events,
           max(value) AS max_value,
           CAST(CAST(sum(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY user_id, date_trunc('hour', ts)
    ORDER BY user_id, hour
    """,
    doc="hypertable-style incremental rollup: two delta merges == one direct agg",
)
def rollup_incremental_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feeds the (user_id, hour) rollup in two chronological batches
    through maintain_hourly_rollup (streaming/pipelines.py) — the
    foreachBatch-shaped continuous-aggregate path — then reads the
    stored table back. Decimal-lane sums keep the fold associative
    across engines. Scale: each batch costs O(|batch keys|); the
    stored rollup is never rescanned in full."""
    import tempfile

    from sf_etl_spark.streaming.pipelines import (
        maintain_hourly_rollup,
        read_merge_target,
    )

    e = load_table(spark, sf_dir, "events")
    # batch boundary mid-span; hours STRADDLING it land in both
    # batches, so the fold path (not just insert) is exercised
    cut = F.lit("2024-01-02 12:30:00").cast("timestamp_ntz")
    rollup_dir = tempfile.mkdtemp(prefix="rollup_inc_") + "/user_hourly"
    maintain_hourly_rollup(e.filter(F.col("ts") <= cut), rollup_dir)
    maintain_hourly_rollup(e.filter(F.col("ts") > cut), rollup_dir)
    back = read_merge_target(spark, rollup_dir)
    # sum_value is stored exact decimal(38,10); the double cast is
    # presentation-only (string hop = same decimal→double parse DuckDB
    # applies to its VARCHAR cast, keeping the hash bit-equal)
    return (
        back.select(
            "user_id",
            "hour",
            "n_events",
            "max_value",
            F.col("sum_value").cast("string").cast("double").alias("sum_value"),
        )
        .orderBy("user_id", "hour")
    )
