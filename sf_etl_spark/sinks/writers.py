"""Data sinks: partitioned parquet/CSV/JSON writers plus a JDBC lane.

Reference parity: the reference's only sink is a DDL *text file*
(`sql-builder/src/main.rs:77-79`) — it never writes data. Here the
sink surface is completed the Spark-native way, with the DDL renderer
(`sf_etl_spark.schema.ddl`, reference R9 parity) available to
pre-create JDBC targets.

Scale defaults, each deliberate:
 - **zstd** compression: ~30% smaller than snappy at similar read
   speed — at 100 TB that's tens of TB of storage and shuffle I/O.
 - **partitionBy** on low-cardinality keys gives partition-pruned
   reads (`PartitionFilters` in the scan) — the difference between
   scanning 100 TB and scanning one day/status slice.
 - **maxRecordsPerFile** caps file size so a skewed partition can't
   produce a single monster file that serializes a downstream task.
 - **no coalesce(1)**: writers keep the plan's parallelism; small-file
   compaction is a separate maintenance pass, not a write-path stall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "zstd",
    max_records_per_file: int | None = 5_000_000,
) -> None:
    """Partitioned parquet sink with scale-safe defaults."""
    w = df.write.mode(mode).option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    compression: str = "gzip",
) -> None:
    """CSV sink — the reference's bulk-extract wire format
    (`BulkQueryStatusResponse.content_type: CSV`,
    `oxidized-force/src/response.rs:36-44`), emitted rather than
    fetched. Splittable-unfriendly (gzip), so for interchange only."""
    df.write.mode(mode).option("header", header).option("compression", compression).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — the reference's REST response shape
    (`QueryResponse.records`, `response.rs:4-10`) as an output lane."""
    df.write.mode(mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """ORC sink — the columnar alternative to parquet for warehouses
    standardized on ORC; same pushdown/pruning properties."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    num_partitions: int | None = None,
    **options: str,
) -> None:
    """JDBC sink (e.g. the Postgres target the reference's DDL
    prepares). Each write partition opens one connection; cap with
    `num_partitions` so a wide plan doesn't open 1000 connections.
    Raises the underlying error when no driver jar is on the
    classpath — this container carries none, so tests gate on it."""
    w = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batch_size)
    )
    if num_partitions:
        w = w.option("numPartitions", num_partitions)
    for k, v in options.items():
        w = w.option(k, v)
    w.mode(mode).save()
