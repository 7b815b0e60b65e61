"""Connector/ETL surface: the reference's two crates re-expressed as a
Spark data source plus a schema pipeline.

* :mod:`client` — REST/Bulk client (R1-R7) with pagination + results
  download (the reference's two gaps, SURVEY §2.1 R2/R6).
* :mod:`datasource` — Spark Python DataSource: partitioned parallel
  extraction (bulk chunk / PK-range splits).
* :func:`read_object` — scan + typed coercion in one call.
* :func:`generate_table_ddl` — the ``sf-sql`` CLI pipeline
  (login → describe → DDL text, ``sql-builder/src/main.rs:51-82``)
  as a library function.
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession

from sf_etl_spark.connector.client import (
    BulkJob,
    JobState,
    QueryPage,
    ResultChunk,
    SfClient,
)
from sf_etl_spark.connector.datasource import FORMAT_NAME, SfEtlDataSource, register
from sf_etl_spark.connector.errors import (
    ClientBuilderError,
    ConnectorError,
    HttpError,
    JobFailedError,
    NotAuthenticatedError,
    ResponseError,
    TokenError,
)

__all__ = [
    "BulkJob",
    "ClientBuilderError",
    "ConnectorError",
    "FORMAT_NAME",
    "HttpError",
    "JobFailedError",
    "JobState",
    "NotAuthenticatedError",
    "QueryPage",
    "ResponseError",
    "ResultChunk",
    "SfClient",
    "SfEtlDataSource",
    "TokenError",
    "generate_table_ddl",
    "read_object",
    "register",
]


def read_object(
    spark: SparkSession,
    options: dict[str, str],
    object_name: str,
    coerce: bool = True,
) -> DataFrame:
    """Scan one SObject into a typed DataFrame.

    The scan yields wire strings (executor-parallel fetch); the typed
    cast lane (`schema/ingest.coerce_dataframe`) then runs as Catalyst
    expressions — the describe-driven equivalent of the reference's
    per-caller serde structs (``response.rs:4-10``).
    """
    from sf_etl_spark.connector.datasource import _client_from_options
    from sf_etl_spark.schema.ingest import coerce_dataframe

    register(spark)
    reader = spark.read.format(FORMAT_NAME).option("object", object_name)
    for k, v in options.items():
        reader = reader.option(k, v)
    raw = reader.load()
    if not coerce:
        return raw
    schema = _client_from_options(options).describe(object_name)
    if options.get("fields"):
        # projected read: coerce only the selected fields (otherwise the
        # cast lane would re-add dropped columns as typed nulls)
        keep = {f.strip() for f in options["fields"].split(",")}
        schema = replace(
            schema, fields=tuple(f for f in schema.fields if f.name in keep)
        )
    return coerce_dataframe(raw, schema)


def generate_table_ddl(
    client: SfClient,
    object_name: str,
    dialect: str = "postgres",
    output_path: str | None = None,
) -> str:
    """E1 pipeline: describe → StructType → CREATE TABLE text.

    Deterministic column order (describe order) — unlike the
    reference's HashMap-keyed table (``sql/table.rs:11``).
    """
    from sf_etl_spark.schema.ddl import create_table_ddl

    schema = client.describe(object_name)
    ddl = create_table_ddl(object_name, schema.to_struct_type(), dialect=dialect)
    if output_path:
        with open(output_path, "w", encoding="utf-8") as fh:
            fh.write(ddl + "\n")
    return ddl
