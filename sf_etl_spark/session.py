"""SparkSession factory tuned for this engine.

Defaults are chosen for scale-out correctness first (AQE on, skew-join
handling, broadcast thresholds) and local-mode speed second. On a real
cluster the same settings hold; only `master` and memory sizing change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configs applied to every session this engine creates. Each one is a
#: deliberate scale decision:
#:  - AQE: runtime coalescing of shuffle partitions, skew-join splitting
#:    and dynamic broadcast-join demotion/promotion — essential at 100 TB
#:    where static planning guesses wrong.
#:  - shuffle.partitions: a *starting* width; AQE coalesces down. On a
#:    1000-executor cluster this should be ~2-3x total cores; locally we
#:    match the core count so tests don't drown in empty partitions.
#:  - Arrow: every Pandas-UDF / toPandas boundary is Arrow-batched.
#:  - autoBroadcastJoinThreshold: dims (region/nation/customer at small
#:    SF) broadcast automatically; large fact-fact joins still shuffle.
ENGINE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.python.filterPushdown.enabled": "true",  # connector pushFilters
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.cbo.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # TIMESTAMP(NANOS) parquet columns: Spark refuses them outright
    # ([PARQUET_TYPE_ILLEGAL]) unless surfaced as raw longs; the events
    # loader rebuilds a microsecond TIMESTAMP_NTZ from the long (see
    # sources/tables.py). Engine-wide and declared HERE — a table
    # loader must never mutate session config as a side effect.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def get_spark(app_name: str = "sf_etl_spark", master: str | None = None) -> SparkSession:
    """Create (or fetch) a SparkSession with the engine's tuned config.

    `master` defaults to ``local[$SPARK_GRAFT_CPUS]`` when not running
    under an existing session (e.g. the driver supplies its own).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    for k, v in ENGINE_CONF.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def apply_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine configs to an existing session.

    Used when the caller (e.g. the verification driver) owns session
    construction: static configs (memory) are skipped, SQL configs
    applied.
    """
    for k, v in ENGINE_CONF.items():
        if k.startswith("spark.sql."):
            try:
                spark.conf.set(k, v)
            except Exception:
                pass  # static or restricted conf under this deployment
    return spark
