"""Plan-level front doors (pre-Catalyst string → DataFrame compilers)."""

from sf_etl_spark.plans.soql import SoqlError, soql_to_df

__all__ = ["SoqlError", "soql_to_df"]
