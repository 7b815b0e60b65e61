"""Registry entries that go through the SOQL front door
(`plans/soql.py`): the string the reference would have shipped to
Salesforce (``client.rs:199-205``) is compiled to DataFrame ops and
verified against ANSI SQL on the same data — proving the translated
semantics, not just the translator's unit behavior.

Float-sum aggregates are deliberately avoided here (COUNT/MIN/MAX
only): SOQL SUM maps to a plain double sum whose accumulation order
is engine-specific, and the front door should not smuggle in the
decimal-lane rewrite the relational suite uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sf_etl_spark.plans import soql_to_df
from sf_etl_spark.queries import register
from sf_etl_spark.sources import load_table


def _resolver(spark: SparkSession, sf_dir: str):
    return lambda name: load_table(spark, sf_dir, name)


@register(
    "soql_orders_rollup",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT)                 AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           max(o_totalprice)                        AS max_price,
           min(o_orderdate)                         AS first_date
    FROM orders
    WHERE o_totalprice > 50000
    GROUP BY o_orderstatus
    HAVING count(o_orderkey) > 5
    ORDER BY o_orderstatus
    """,
    doc="SOQL front door: WHERE + GROUP BY + HAVING + aggregates",
)
def soql_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return soql_to_df(
        "SELECT o_orderstatus, COUNT() n_orders, COUNT_DISTINCT(o_custkey) n_cust, "
        "MAX(o_totalprice) max_price, MIN(o_orderdate) first_date "
        "FROM orders WHERE o_totalprice > 50000 "
        "GROUP BY o_orderstatus HAVING COUNT(o_orderkey) > 5 ORDER BY o_orderstatus",
        _resolver(spark, sf_dir),
    )


@register(
    "soql_documents_filter",
    """
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE lang IN ('en', 'de') AND n_chars > 500
    ORDER BY doc_id
    LIMIT 100
    """,
    doc="SOQL front door: IN-list filter + order + limit",
)
def soql_documents_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return soql_to_df(
        "SELECT doc_id, lang, n_chars FROM documents "
        "WHERE lang IN ('en', 'de') AND n_chars > 500 ORDER BY doc_id LIMIT 100",
        _resolver(spark, sf_dir),
    )


#: relationship registry for the synthetic star schema — the local
#: analog of Salesforce `Reference.relationship_name` (SURVEY §1.2):
#: rel name -> (parent object, fk on child, pk on parent)
RELATIONSHIPS = {
    "customer": ("customer", "o_custkey", "c_custkey"),
    "order": ("orders", "l_orderkey", "o_orderkey"),
    "nation": ("nation", "c_nationkey", "n_nationkey"),
}


@register(
    "soql_parent_traversal",
    """
    SELECT o.o_orderkey, c.c_name AS customer_c_name,
           c.c_mktsegment AS customer_c_mktsegment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal > 5000 AND o.o_totalprice > 200000
    ORDER BY o.o_orderkey
    LIMIT 50
    """,
    doc="SOQL child-to-parent dotted traversal → left join (broadcast dim)",
)
def soql_parent_traversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return soql_to_df(
        "SELECT o_orderkey, customer.c_name, customer.c_mktsegment "
        "FROM orders "
        "WHERE customer.c_acctbal > 5000 AND o_totalprice > 200000 "
        "ORDER BY o_orderkey LIMIT 50",
        _resolver(spark, sf_dir),
        relationships=RELATIONSHIPS,
    )


@register(
    "soql_rollup_traversal",
    """
    SELECT c.c_mktsegment AS seg,
           CAST(count(*) AS BIGINT) AS n_orders,
           max(o.o_totalprice) AS max_price
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY ROLLUP(c.c_mktsegment)
    ORDER BY seg NULLS FIRST
    """,
    doc="SOQL GROUP BY ROLLUP over a traversed parent field",
)
def soql_rollup_traversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return soql_to_df(
        "SELECT customer.c_mktsegment seg, COUNT() n_orders, "
        "MAX(o_totalprice) max_price "
        "FROM orders GROUP BY ROLLUP(customer.c_mktsegment) "
        "ORDER BY seg NULLS FIRST",
        _resolver(spark, sf_dir),
        relationships=RELATIONSHIPS,
    )
