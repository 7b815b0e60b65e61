"""Schema system: source-type mapping, describe ingestion, DDL sink.

The reference's whole ``sql-builder`` crate re-expressed on Spark's
``StructType`` (SURVEY.md §1.2, §2.1 R3/R8/R9): describe-JSON →
``ObjectSchema`` → ``StructType`` (with lossless field metadata) →
per-dialect ``CREATE TABLE`` text.
"""

from sf_etl_spark.schema.ddl import (
    DIALECTS,
    PgDialect,
    SparkDialect,
    SqlDialect,
    create_table_ddl,
)
from sf_etl_spark.schema.field_types import (
    Field,
    FieldType,
    ObjectSchema,
    spark_type_for,
    struct_field_for,
)

__all__ = [
    "DIALECTS",
    "Field",
    "FieldType",
    "ObjectSchema",
    "PgDialect",
    "SparkDialect",
    "SqlDialect",
    "create_table_ddl",
    "spark_type_for",
    "struct_field_for",
]
