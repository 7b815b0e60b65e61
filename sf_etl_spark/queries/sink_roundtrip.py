"""Sink round-trip proof through the correctness gate.

The reference's only sink is a DDL text file (``sql-builder/src/
main.rs:77-79``) — it never writes data. This registry entry proves
the engine's data sink end-to-end: write a partitioned parquet copy
(zstd, bounded file sizes — `sinks/writers.py` scale defaults), read
it back, aggregate, and hash-match the aggregate against the oracle
computed on the ORIGINAL table. Any loss, duplication, or type drift
introduced by the write→read cycle (partition-column round-trip
included) breaks the value hash.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sf_etl_spark.queries import register
from sf_etl_spark.queries.relational import SUMD, dsum
from sf_etl_spark.sinks import write_parquet
from sf_etl_spark.sources import load_table


@register(
    "sink_roundtrip_partitioned",
    f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           {SUMD('o_totalprice')} AS total_price,
           min(o_orderdate) AS first_date,
           max(o_orderdate) AS last_date
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="write orders partitioned-by-status → read back → agg (lossless sink proof)",
)
def sink_roundtrip_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    out = tempfile.mkdtemp(prefix="sink_rt_") + "/orders"
    write_parquet(orders, out, partition_by=["o_orderstatus"])
    back = spark.read.parquet(out)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_distinct("o_custkey").alias("n_cust"),
            dsum("o_totalprice").alias("total_price"),
            F.min("o_orderdate").alias("first_date"),
            F.max("o_orderdate").alias("last_date"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "source_csv_roundtrip",
    f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           {SUMD('o_totalprice')} AS total_price,
           CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR) AS first_date
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="orders → CSV (header, explicit schema) → read back → agg (lossless CSV source lane)",
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source proof: Spark's CSV writer emits shortest-round-trip
    doubles (Java ``Double.toString``), so an explicit-schema read
    recovers values bit-exactly; the oracle runs on the ORIGINAL
    parquet table, so any CSV formatting/parsing drift breaks the
    hash. Schema is passed explicitly — header-based inference is a
    corpus-scale anti-pattern (one extra full scan).
    """
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    out = tempfile.mkdtemp(prefix="src_csv_") + "/orders_csv"
    from sf_etl_spark.sinks import write_csv

    write_csv(orders.select(*cols), out)
    schema = (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate date"
    )
    back = spark.read.schema(schema).option("header", "true").csv(out)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
            # ISO string, not DateType: Spark's toPandas renders dates
            # as datetime64 or datetime.date depending on the plan
            # path, and the comparator shouldn't have to care
            F.min("o_orderdate").cast("string").alias("first_date"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "source_orc_roundtrip",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_lines,
           {SUMD('l_extendedprice')} AS total_price,
           {SUMD('l_quantity')} AS total_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="lineitem → ORC (zstd) → read back → agg (lossless columnar alt-format lane)",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink proof: ORC embeds its schema (unlike CSV no
    explicit schema is needed) and keeps the same pushdown/pruning
    properties as parquet; the oracle aggregates the ORIGINAL parquet
    table, so any type or value drift through the ORC cycle breaks
    the value hash. timestamp_ntz note: ORC stores the fixture's
    TIMESTAMP_NTZ natively in Spark 4."""
    li = load_table(spark, sf_dir, "lineitem")
    out = tempfile.mkdtemp(prefix="src_orc_") + "/lineitem_orc"
    from sf_etl_spark.sinks import write_orc

    write_orc(li.select("l_returnflag", "l_linestatus", "l_extendedprice", "l_quantity"), out)
    back = spark.read.orc(out)
    return (
        back.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_extendedprice").alias("total_price"),
            dsum("l_quantity").alias("total_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "source_json_roundtrip",
    f"""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_cust,
           {SUMD('c_acctbal')} AS total_bal
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="customer → JSON lines → read back (explicit schema) → agg (REST-shape lane)",
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines round trip — the reference's REST wire shape
    (``QueryResponse.records``, ``response.rs:4-10``) proven lossless
    as a source lane. Doubles serialize shortest-round-trip, so an
    explicit-schema read recovers them bit-exactly; schema inference
    is avoided (corpus-scale anti-pattern: one extra full scan)."""
    c = load_table(spark, sf_dir, "customer")
    out = tempfile.mkdtemp(prefix="src_json_") + "/customer_json"
    from sf_etl_spark.sinks import write_json

    write_json(c.select("c_custkey", "c_mktsegment", "c_acctbal"), out)
    schema = "c_custkey bigint, c_mktsegment string, c_acctbal double"
    back = spark.read.schema(schema).json(out)
    return (
        back.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_cust"), dsum("c_acctbal").alias("total_bal"))
        .orderBy("c_mktsegment")
    )
