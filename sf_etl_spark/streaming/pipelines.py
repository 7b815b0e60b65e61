"""Streaming pipelines over the ``events`` table.

Design rules for 100 TB streams:

* **Watermarks bound state.** Every stateful op (windowed agg, dedup,
  custom state) declares ``withWatermark`` so the state store evicts;
  unbounded state is the streaming equivalent of a driver collect.
* **Same plan as batch.** ``F.window`` / ``F.session_window`` plans
  are shared with the oracle-verified batch queries
  (`queries/streaming_batch.py`); streaming correctness then reduces
  to replay semantics, which the tests drive via ``availableNow``.
* **File-source staging.** Tests replay the parquet ``events`` fixture
  as a chunked file stream (``maxFilesPerTrigger=1`` → one micro-batch
  per chunk). In production the same pipelines sit behind any
  streaming source (Kafka, rate, files); nothing below depends on the
  source beyond the schema.
"""

from __future__ import annotations

import math
import os
import tempfile
import uuid

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor
from pyspark.sql.types import StructType

from sf_etl_spark.sources import load_table

# Watermarks require TIMESTAMP (LTZ), not TIMESTAMP_NTZ
# ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]); with the engine's session tz
# pinned to UTC the NTZ→LTZ cast at staging time is value-preserving,
# so streaming windows collect to the same naive datetimes as batch.
EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


# ---------------------------------------------------------------------------
# Source staging
# ---------------------------------------------------------------------------


def stage_events_as_stream_source(
    spark: SparkSession, sf_dir: str, out_dir: str, n_chunks: int = 4, duplicate: bool = False
) -> str:
    """Write the batch ``events`` table as ``n_chunks`` parquet files in
    time order, so a file stream replays it as ordered micro-batches.

    ``duplicate=True`` appends a copy of every chunk (distinct file,
    same rows) — the late-duplicate fixture for
    ``dropDuplicatesWithinWatermark``.

    NOTE: the global (partition-less) row_number window below is
    deliberate and TEST-HARNESS-ONLY — replay chunk boundaries must be
    globally deterministic, which requires a total order. It warns
    "Moving all data to a single partition" and would not scale; the
    production ingestion path never runs this code — it consumes an
    already-ordered stream via ``events_stream`` (readStream).
    """
    e = (
        load_table(spark, sf_dir, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .orderBy("ts")
    )
    n = e.count()
    chunk_rows = math.ceil(n / n_chunks)
    # Deterministic chunking by time rank (single window pass).
    from pyspark.sql import Window

    w = Window.orderBy("ts", "event_id")
    ranked = e.withColumn("_chunk", ((F.row_number().over(w) - 1) / chunk_rows).cast("int"))
    for i in range(n_chunks):
        part = ranked.filter(F.col("_chunk") == i).drop("_chunk")
        part.coalesce(1).write.mode("overwrite").parquet(os.path.join(out_dir, f"_stage_{i}"))
        # single ordered file per chunk → stable replay order
        src = [
            f
            for f in os.listdir(os.path.join(out_dir, f"_stage_{i}"))
            if f.endswith(".parquet")
        ][0]
        os.replace(
            os.path.join(out_dir, f"_stage_{i}", src),
            os.path.join(out_dir, f"chunk_{i:04d}.parquet"),
        )
        if duplicate:
            import shutil

            shutil.copyfile(
                os.path.join(out_dir, f"chunk_{i:04d}.parquet"),
                os.path.join(out_dir, f"chunk_{i:04d}_dup.parquet"),
            )
    return out_dir


def events_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Unbounded ``events`` DataFrame over a staged file source."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


# ---------------------------------------------------------------------------
# Stateful pipelines (each takes the unbounded df, returns the plan)
# ---------------------------------------------------------------------------


def stream_tumbling_agg(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """1h tumbling window counts/sums — the streaming twin of the
    oracle-checked ``window_tumbling`` batch query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,10)"))
            .cast("string")
            .cast("double")
            .alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def stream_sliding_agg(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """1h window / 30m slide (streaming twin of ``window_sliding``)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,10)"))
            .cast("string")
            .cast("double")
            .alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def stream_session_agg(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Per-user session windows (5m gap) — ``F.session_window`` is
    inherently stateful; merging sessions across micro-batches is
    exactly what the state store does (streaming twin of
    ``window_session``)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,10)"))
            .cast("string")
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def stream_dedup_within_watermark(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Exactly-once by key under replay/at-least-once delivery:
    ``dropDuplicatesWithinWatermark`` keeps key state only inside the
    watermark horizon — bounded state at any scale, which plain
    ``dropDuplicates`` on a stream does not give."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def stream_click_attribution(
    clicks: DataFrame, purchases: DataFrame, horizon: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join: purchases attributed to a same-user
    click within ``horizon``.

    Both sides carry watermarks and the join condition bounds event
    time from BOTH directions — exactly what lets Spark prune join
    state: a click older than watermark+horizon can never match a
    future purchase and is evicted. Unbounded state in a stream-stream
    join is the 100 TB killer; the interval condition is not an
    optimization, it is the correctness condition for bounded memory.
    """
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    return c.join(
        p,
        F.expr(
            f"c_user = p_user AND purchase_ts >= click_ts "
            f"AND purchase_ts < click_ts + INTERVAL {horizon}"
        ),
        "inner",
    ).select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")).alias(
            "gap_seconds"
        ),
    )


# -- custom stateful operator (applyInPandasWithState) ----------------------

_USER_STATS_OUTPUT = "user_id bigint, n_events bigint, total_value double, last_ts timestamp"
_USER_STATS_STATE = "n bigint, total double, last_us bigint"


def _user_stats_fn(key, pdf_iter, state: GroupState):
    """Running per-user (count, sum, last-seen) — state is three scalars
    per key, the smallest possible footprint; emits one updated row per
    key per micro-batch."""
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].max().value // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [pd.Timestamp(last_us * 1000)],
        }
    )


def stream_stateful_user_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Custom stateful op via ``applyInPandasWithState`` (Arrow-batched;
    the reference has no extension point like this at all)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _user_stats_fn,
            outputStructType=_USER_STATS_OUTPUT,
            stateStructType=_USER_STATS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Execution helpers
# ---------------------------------------------------------------------------


def run_to_memory_table(
    plan: DataFrame, output_mode: str, checkpoint_dir: str | None = None
) -> tuple[str, object]:
    """Run a streaming plan to completion (``availableNow``) into a
    memory sink; returns (table_name, query). Memory sink is test/demo
    only — production sinks are files/Kafka/foreachBatch."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_")
    q = (
        plan.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name, q


BUCKET_COL = "_kbucket"
MERGE_META = "_merge_meta.json"


def _meta_path(spark: SparkSession, target_path):
    return spark.sparkContext._jvm.org.apache.hadoop.fs.Path(target_path, MERGE_META)


def _read_bucket_meta(spark: SparkSession, fs, target_path) -> int | None:
    """Bucket count recorded at target bootstrap, or None for a fresh
    or pre-metadata target."""
    import json

    meta = _meta_path(spark, target_path)
    if not fs.exists(meta):
        return None
    stream = fs.open(meta)
    try:
        data = bytearray()
        b = stream.read()
        while b >= 0:
            data.append(b)
            b = stream.read()
        return int(json.loads(bytes(data).decode("utf-8"))["n_buckets"])
    finally:
        stream.close()


def _write_bucket_meta(spark: SparkSession, fs, target_path, n_buckets: int) -> None:
    import json

    out = fs.create(_meta_path(spark, target_path), True)
    try:
        payload = json.dumps({"n_buckets": n_buckets, "bucket_col": BUCKET_COL})
        out.write(bytearray(payload.encode("utf-8")))
    finally:
        out.close()


def upsert_partitioned_parquet(
    batch_df: DataFrame, key_cols: list[str], target_dir: str, n_buckets: int = 16
) -> None:
    """Keyed upsert of one batch into a bucket-partitioned parquet
    target, rewriting ONLY the partitions the batch touches.

    The special case of :func:`merge_into_partitioned_parquet` every
    streaming sink wants: matched keys take the batch row, unmatched
    batch rows insert, target-only rows survive untouched. See the
    general operator for the copy-on-write mechanics and scale notes.
    """
    merge_into_partitioned_parquet(
        batch_df, key_cols, target_dir, n_buckets=n_buckets
    )


def merge_into_partitioned_parquet(
    batch_df: DataFrame,
    key_cols: list[str],
    target_dir: str,
    *,
    when_matched: list[tuple[Column | None, str]] = ((None, "update"),),
    not_matched_insert: Column | bool = True,
    drop_cols: list[str] | None = None,
    n_buckets: int = 16,
) -> None:
    """SQL ``MERGE INTO`` over a bucket-partitioned parquet target,
    rewriting ONLY the partitions the source batch touches.

    Clause semantics mirror ANSI MERGE (and Delta/Iceberg ``MERGE``):

    * ``when_matched`` — ordered ``(condition, action)`` clauses
      evaluated per MATCHED source row against the SOURCE columns;
      the first true condition wins (``None`` = always true). Actions:
      ``"update"`` (source row replaces the target row) or
      ``"delete"`` (target row removed). A matched row matching no
      clause leaves the target row untouched.
    * ``not_matched_insert`` — condition under which a source row with
      no target match inserts (``True`` = always, ``False`` = never):
      the ``WHEN NOT MATCHED THEN INSERT`` clause.
    * ``drop_cols`` — source-only columns (e.g. a CDC ``op`` column)
      stripped before rows enter the target, so the target schema
      stays closed under the merge.

    Copy-on-write mechanics: the target is partitioned by
    ``_kbucket = pmod(xxhash64(keys), n)`` — a key always lands in the
    same bucket, so the merge is local to the buckets of the incoming
    keys. Per batch:

    1. buckets touched = distinct ``_kbucket`` of the batch (≤ n);
    2. current rows of ONLY those buckets are read (partition-pruned
       scan — the filter is on the partition column);
    3. matched/unmatched split is two broadcast-friendly joins of the
       (small) batch against the touched buckets; clause dispatch is
       one ``F.when`` chain — no per-row Python;
    4. written with ``partitionOverwriteMode=dynamic``: Spark replaces
       exactly the partition directories present in the written data.

    Untouched buckets' files are not read, not rewritten, not moved —
    byte-identical after the merge (asserted in tests). Cost per batch
    is O(|touched buckets|), not O(|table|): the property that keeps a
    continuously-merged 100 TB target alive. (A transactional format —
    Delta/Iceberg — adds snapshot atomicity on top; this is the sound
    plain-parquet shape, and the writer commit protocol keeps
    partially-written partitions invisible until commit.)

    All path probing goes through the Hadoop ``FileSystem`` resolved
    FROM the target path, and the staging dir is a sibling of the
    target on the SAME filesystem — so the merge works unchanged on
    ``hdfs://`` / ``s3a://`` targets, where an ``os.path`` check would
    silently report "absent" and the merge branch would drop every
    pre-existing key in the touched partitions.
    """
    spark = batch_df.sparkSession
    for _, action in when_matched:
        if action not in ("update", "delete"):
            raise ValueError(f"unknown MERGE action {action!r}")
    drop = list(drop_cols or [])
    if isinstance(not_matched_insert, bool):
        not_matched_insert = F.lit(not_matched_insert)
    fs, target_path = _hadoop_fs(spark, target_dir)
    staging_path = None
    # the dynamic-overwrite committer writes no root _SUCCESS marker;
    # presence of bucket partition dirs is the bootstrap signal
    exists = fs.exists(target_path) and any(
        st.getPath().getName().startswith(BUCKET_COL + "=")
        or st.getPath().getName() == "_SUCCESS"
        for st in fs.listStatus(target_path)
    )
    # the bucket count is a property of the TARGET, not the call: a
    # batch bucketed mod m against a target laid out mod n (m != n)
    # filters the wrong partitions and silently degrades the merge to
    # insert-only. Bootstrap records n_buckets in _merge_meta.json;
    # later merges adopt it, whatever the caller passed.
    if exists:
        n_buckets = _read_bucket_meta(spark, fs, target_path) or n_buckets
    bucket = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets)).cast(
        "int"
    )
    src = batch_df.dropDuplicates(key_cols).withColumn(BUCKET_COL, bucket)
    if exists:
        touched = [r[0] for r in src.select(BUCKET_COL).distinct().collect()]
        cur = spark.read.parquet(target_dir).filter(F.col(BUCKET_COL).isin(touched))
        cur_keys = cur.select(*key_cols)
        matched = src.join(cur_keys, key_cols, "left_semi")
        unmatched = src.join(cur_keys, key_cols, "left_anti")
        # first-true-clause-wins dispatch, exactly SQL MERGE ordering
        action_col = F.lit(None).cast("string")
        for cond, action in reversed(list(when_matched)):
            c = F.lit(True) if cond is None else cond
            action_col = F.when(c, F.lit(action)).otherwise(action_col)
        matched = matched.withColumn("__merge_action", action_col)
        replaced_or_deleted = matched.filter(
            F.col("__merge_action").isin("update", "delete")
        ).select(*key_cols)
        updates = matched.filter(F.col("__merge_action") == "update").drop(
            "__merge_action", *drop
        )
        inserts = unmatched.filter(not_matched_insert).drop(*drop)
        survivors = cur.join(replaced_or_deleted, key_cols, "left_anti")
        out = survivors.unionByName(updates).unionByName(inserts)
        # Spark refuses to overwrite a path its own plan reads; stage the
        # merged TOUCHED buckets (only them — this is what keeps the merge
        # O(touched), unlike a full-table write-then-swap) and re-read.
        # Sibling of the target => same FileSystem, no cross-FS copy.
        staging = (
            fs.makeQualified(target_path).toString()
            + f"__upsert_stage_{uuid.uuid4().hex[:8]}"
        )
        out.write.mode("overwrite").parquet(staging)
        merged = spark.read.parquet(staging)
        _, staging_path = _hadoop_fs(spark, staging)
    else:
        merged = src.filter(not_matched_insert).drop(*drop)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BUCKET_COL)
        .parquet(target_dir)
    )
    if exists:
        # dynamic overwrite replaces only partitions PRESENT in the
        # written data: a touched bucket whose rows were all deleted
        # writes nothing, so its stale directory (and rows) would
        # survive. Remove those directories explicitly. (≤ n_buckets
        # values collected — bounded, not data-sized.)
        remaining = {r[0] for r in merged.select(BUCKET_COL).distinct().collect()}
        jvm = spark.sparkContext._jvm
        for b in set(touched) - remaining:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(target_path, f"{BUCKET_COL}={b}"), True
            )
    else:
        _write_bucket_meta(spark, fs, target_path, n_buckets)
    if staging_path is not None:
        fs.delete(staging_path, True)


def _hadoop_fs(spark: SparkSession, path_str: str):
    """(FileSystem, Path) for ``path_str``, resolved through the JVM
    gateway — the filesystem-abstract twin of ``os.path``: local paths,
    ``hdfs://``, ``s3a://`` all answer the same API."""
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path(path_str)
    return jpath.getFileSystem(sc._jsc.hadoopConfiguration()), jpath


def foreach_batch_upsert_parquet(
    plan: DataFrame, key_cols: list[str], target_dir: str, n_buckets: int = 16
):
    """``foreachBatch`` upsert sink over :func:`upsert_partitioned_parquet`.

    The batch-DataFrame shape of ``foreachBatch`` is what makes any
    batch sink reusable from streaming; at scale the same body targets
    Delta/Iceberg ``MERGE`` for snapshot atomicity.
    """

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        upsert_partitioned_parquet(batch_df, key_cols, target_dir, n_buckets)

    ckpt = tempfile.mkdtemp(prefix="ckpt_upsert_")
    return (
        plan.writeStream.foreachBatch(_merge)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


# -- custom stateful operator, Spark 4 API (transformWithStateInPandas) -----


class _UserStatsProcessor(StatefulProcessor):
    """``StatefulProcessor`` twin of :func:`_user_stats_fn` on the
    Spark 4 ``transformWithState`` API: typed per-key ValueState,
    RocksDB-backed — the successor to GroupState with composite state
    (value/list/map), timers, and TTL available when needed."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("stats", _USER_STATS_STATE)

    def handleInputRows(self, key, rows, timer_values):
        n, total, last_us = self._state.get() if self._state.exists() else (0, 0.0, 0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
            if len(pdf):
                last_us = max(last_us, int(pdf["ts"].max().value // 1000))
        self._state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [pd.Timestamp(last_us * 1000)],
            }
        )

    def close(self) -> None:
        pass


def stream_tws_user_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Per-user running stats on ``transformWithStateInPandas``.

    Requires the RocksDB state store (set by the caller/session):
    state lives off-heap and checkpoint-incrementally — the store
    that actually survives 100 TB key cardinalities.

    Environment gate: the TWS python⇄JVM state protocol needs the
    ``protobuf`` package; this container ships without it, so the
    operator is exercised by a skip-gated test rather than a registry
    query. The plan construction below is environment-independent.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_UserStatsProcessor(),
            outputStructType=_USER_STATS_OUTPUT,
            outputMode="Update",
            timeMode="None",
        )
    )


# -- incremental rollup maintenance (hypertable-style continuous agg) -------


def maintain_hourly_rollup(
    batch_df: DataFrame,
    rollup_dir: str,
    n_buckets: int = 16,
) -> None:
    """Incrementally maintain an (user_id, hour) aggregate table from
    an events batch — the continuous-aggregate / hypertable-rollup
    pattern: the fact stream is never re-scanned; each batch folds its
    partial aggregates into the stored rollup.

    Mechanics: the batch pre-aggregates to one row per touched
    (user_id, hour) key; existing rollup rows for ONLY those keys are
    read back (semi join against the touched buckets — the merge
    machinery's partition pruning), COMBINED (counts add, sums add,
    max takes max — every aggregate here is a commutative monoid,
    which is the admission rule for this pattern: avg is maintained as
    sum+count, never as avg), and merged back with replace semantics.
    Cost per batch is O(|batch keys|), independent of rollup size —
    the property that keeps a year-long 100 TB rollup maintainable
    per-minute.

    Exactly-once: driven from ``foreachBatch`` the combine is
    idempotent per epoch only if the sink dedupes batch replays;
    production would stamp ``batch_id`` and skip seen epochs (the
    standard foreachBatch idempotence recipe).
    """
    spark = batch_df.sparkSession
    key_cols = ["user_id", "hour"]
    delta = (
        batch_df.withColumn("hour", F.date_trunc("hour", F.col("ts")))
        .groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,10)")).alias("_dsum"),
            F.max("value").alias("max_value"),
        )
        .withColumn("sum_value", F.col("_dsum").cast("string").cast("double"))
        .drop("_dsum")
    )
    fs, target_path = _hadoop_fs(spark, rollup_dir)
    exists = fs.exists(target_path) and any(
        st.getPath().getName().startswith(BUCKET_COL + "=")
        or st.getPath().getName() == "_SUCCESS"
        for st in fs.listStatus(target_path)
    )
    if exists:
        nb = _read_bucket_meta(spark, fs, target_path) or n_buckets
        bucket = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(nb)).cast("int")
        touched = [
            r[0] for r in delta.withColumn(BUCKET_COL, bucket).select(BUCKET_COL).distinct().collect()
        ]
        cur = (
            spark.read.parquet(rollup_dir)
            .filter(F.col(BUCKET_COL).isin(touched))
            .drop(BUCKET_COL)
            .join(delta.select(*key_cols), key_cols, "left_semi")
        )
        # fold: existing partials and the batch partials combine by
        # the same monoid ops the per-batch aggregate used
        delta = (
            cur.unionByName(delta)
            .groupBy(*key_cols)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum(F.col("sum_value").cast("decimal(38,10)"))
                .cast("string")
                .cast("double")
                .alias("sum_value"),
                F.max("max_value").alias("max_value"),
            )
            .select(*key_cols, "n_events", "max_value", "sum_value")
        )
    merge_into_partitioned_parquet(delta, key_cols, rollup_dir, n_buckets=n_buckets)


def vacuum_merge_staging(spark: SparkSession, target_dir: str) -> int:
    """Remove crash-leftover staging directories around a merge target.

    A merge that dies between its staging write and the final swap
    leaves a ``<target>__upsert_stage_<id>`` sibling behind — invisible
    to readers (never referenced) but paying storage. This sweeps them;
    run it from the same maintenance window as compaction. Returns the
    number of directories removed. Safe concurrently with READERS (the
    directories are unreferenced); do not run concurrently with an
    in-flight merge on the SAME target.
    """
    fs, target_path = _hadoop_fs(spark, target_dir)
    parent = target_path.getParent()
    if parent is None or not fs.exists(parent):
        return 0
    prefix = target_path.getName() + "__upsert_stage_"
    removed = 0
    for st in fs.listStatus(parent):
        if st.getPath().getName().startswith(prefix):
            fs.delete(st.getPath(), True)
            removed += 1
    return removed
