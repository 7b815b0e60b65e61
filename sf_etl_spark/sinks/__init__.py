from sf_etl_spark.sinks.writers import (
    write_csv,
    write_jdbc,
    write_json,
    write_orc,
    write_parquet,
)

__all__ = ["write_csv", "write_jdbc", "write_json", "write_orc", "write_parquet"]
