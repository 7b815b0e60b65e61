"""Slowly-Changing-Dimension Type 2 maintenance — versioned history
for dimension tables.

The reference extracts Salesforce objects whose attributes drift
(account segment, owner, tier); analytics joins need the value
AS OF the fact's time, which means keeping every version with a
validity interval, not overwriting (Kimball SCD2). Row shape:

    <business key> <tracked attrs> __valid_from __valid_to __is_current

``__valid_to`` is NULL on the current version; an as-of join is then
``fact.ts >= __valid_from AND (fact.ts < __valid_to OR __valid_to IS
NULL)`` — a plain range join against a dimension-sized table.

Spark-first mechanics: one batch apply is TWO broadcast-friendly joins
(batch × current versions of the touched keys) feeding the
bucket-partitioned merge (`streaming/pipelines.py`), keyed on
``(business key, __valid_from)`` so every version row is addressable:
changed keys CLOSE their current row (update: ``__valid_to`` set) and
INSERT a new current one; unchanged keys are untouched; new keys just
insert. Cost per batch is O(|batch keys|) — the merge machinery's
copy-on-write pruning — never O(|history|).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VALID_FROM, VALID_TO, IS_CURRENT = "__valid_from", "__valid_to", "__is_current"


def scd2_apply(
    batch_df: DataFrame,
    dim_dir: str,
    key_cols: list[str],
    tracked_cols: list[str],
    effective_ts: Column,
    n_buckets: int = 16,
) -> None:
    """Fold one batch of dimension snapshots into the SCD2 history at
    ``dim_dir``.

    ``batch_df`` carries one row per business key (latest snapshot);
    ``effective_ts`` is the batch's effective time (a Column, usually a
    literal or a source timestamp). Per key:

    * new key → insert a current version ``[ts, NULL)``;
    * tracked attributes changed vs the stored current version → close
      the stored version (``__valid_to = ts``, ``__is_current =
      false``) and insert the new current one;
    * changed at the SAME ts as the stored version's ``__valid_from``
      → correct that version in place (attrs replaced, still current;
      no zero-length closed version);
    * unchanged → no write at all (idempotent re-applies).
    """
    from sf_etl_spark.streaming.pipelines import (
        BUCKET_COL,
        _hadoop_fs,
        _read_buckets,
        _read_merge_meta,
        merge_into_partitioned_parquet,
    )

    spark = batch_df.sparkSession
    batch = batch_df.dropDuplicates(key_cols).withColumn("__ts", effective_ts)

    # Probe target existence via the merge manifest through the Hadoop
    # FileSystem. A bare try/except around the read would misclassify
    # any transient failure (IO error, permissions, corrupt footer) as
    # "first apply" and bootstrap-insert new current versions WITHOUT
    # closing the stored ones — two __is_current rows per key. Real
    # read failures now propagate instead.
    fs, target_path = _hadoop_fs(spark, dim_dir)
    meta = _read_merge_meta(spark, fs, target_path)
    have_dim = meta is not None
    if have_dim:
        cur = (
            _read_buckets(spark, dim_dir, meta)
            .filter(F.col(IS_CURRENT))
            .drop(BUCKET_COL)
            .join(batch.select(*key_cols), key_cols, "left_semi")
        )

    def version_row(src: DataFrame, frm: Column) -> DataFrame:
        return src.select(
            *key_cols,
            *tracked_cols,
            frm.cast("timestamp_ntz").alias(VALID_FROM),
            F.lit(None).cast("timestamp_ntz").alias(VALID_TO),
            F.lit(True).alias(IS_CURRENT),
        )

    if not have_dim:
        out = version_row(batch, F.col("__ts"))
        merge_into_partitioned_parquet(
            out, [*key_cols, VALID_FROM], dim_dir, n_buckets=n_buckets
        )
        return

    # pair each batch row with the stored current version (if any) and
    # keep only rows that CHANGE something — unchanged keys drop out
    # here, which is what makes re-applying the same batch a no-op
    b = batch.alias("b")
    c = cur.alias("c")
    changed_expr = F.lit(False)
    for t in tracked_cols:
        changed_expr = changed_expr | ~F.col(f"b.{t}").eqNullSafe(F.col(f"c.{t}"))
    joined = b.join(c, key_cols, "left")
    new_keys = joined.filter(F.col(f"c.{VALID_FROM}").isNull())
    changed = joined.filter(F.col(f"c.{VALID_FROM}").isNotNull() & changed_expr)

    # A change whose effective_ts EQUALS the stored current version's
    # __valid_from is a CORRECTION: the opened row below replaces that
    # version in place (same (key, __valid_from) merge key, attrs
    # updated, still current). Emitting a closed row too would create
    # a zero-length version AND collide with the opened row on the
    # merge key — the merge's dropDuplicates would then keep an
    # arbitrary one of the two, nondeterministically losing either the
    # history close or the correction (r14 review finding).
    same_ts = F.col(f"c.{VALID_FROM}") == F.col("b.__ts").cast("timestamp_ntz")
    closed = changed.filter(~same_ts).select(
        *key_cols,
        *[F.col(f"c.{t}").alias(t) for t in tracked_cols],
        F.col(f"c.{VALID_FROM}").alias(VALID_FROM),
        F.col("b.__ts").cast("timestamp_ntz").alias(VALID_TO),
        F.lit(False).alias(IS_CURRENT),
    )
    opened = changed.select(
        *key_cols,
        *[F.col(f"b.{t}").alias(t) for t in tracked_cols],
        F.col("b.__ts").cast("timestamp_ntz").alias(VALID_FROM),
        F.lit(None).cast("timestamp_ntz").alias(VALID_TO),
        F.lit(True).alias(IS_CURRENT),
    )
    inserted = version_row(
        new_keys.select(*key_cols, *[F.col(f"b.{t}").alias(t) for t in tracked_cols],
                        F.col("b.__ts")),
        F.col("__ts"),
    )
    out = closed.unionByName(opened).unionByName(inserted)
    # closed rows UPDATE their (key, valid_from) version; opened and
    # brand-new rows INSERT new versions — one merge does all three
    merge_into_partitioned_parquet(
        out, [*key_cols, VALID_FROM], dim_dir, n_buckets=n_buckets
    )
