from sf_etl_spark.sinks.writers import (
    compact_parquet,
    write_csv,
    write_jdbc,
    write_json,
    write_orc,
    write_parquet,
)

__all__ = ["compact_parquet", "write_csv", "write_jdbc", "write_json", "write_orc", "write_parquet"]
