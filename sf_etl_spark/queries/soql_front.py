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
    "soql_in_subquery_semi",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE c.c_acctbal > 1000
      AND EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    ORDER BY c.c_custkey
    """,
    doc="SOQL IN (SELECT ...) semi-join subquery → LeftSemi join",
)
def soql_in_subquery_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return soql_to_df(
        "SELECT c_custkey, c_name FROM customer "
        "WHERE c_acctbal > 1000 AND c_custkey IN "
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 300000) "
        "ORDER BY c_custkey",
        _resolver(spark, sf_dir),
    )


@register(
    "soql_in_subquery_anti",
    """
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    ORDER BY c.c_custkey
    """,
    doc="SOQL NOT IN (SELECT ...) anti-join subquery → LeftAnti join (no finished order)",
)
def soql_in_subquery_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    return soql_to_df(
        "SELECT c_custkey, c_mktsegment FROM customer "
        "WHERE c_custkey NOT IN "
        "(SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') "
        "ORDER BY c_custkey",
        _resolver(spark, sf_dir),
    )


@register(
    "soql_multihop_traversal",
    """
    SELECT o.o_orderkey,
           c.c_name AS customer_c_name,
           n.n_name AS customer_nation_n_name,
           r.r_name AS customer_nation_region_r_name
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_totalprice > 250000
    ORDER BY o.o_orderkey
    LIMIT 50
    """,
    doc="SOQL multi-hop dotted traversal (3 hops) → chained broadcast left joins",
)
def soql_multihop_traversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return soql_to_df(
        "SELECT o_orderkey, customer.c_name, customer.nation.n_name, "
        "customer.nation.region.r_name "
        "FROM orders WHERE o_totalprice > 250000 ORDER BY o_orderkey LIMIT 50",
        _resolver(spark, sf_dir),
        relationships={**RELATIONSHIPS, "region": ("region", "n_regionkey", "r_regionkey")},
    )


#: child relationship registry: rel name -> (child object, fk on
#: child, pk on parent) — the inverse direction of RELATIONSHIPS.
CHILD_RELATIONSHIPS = {
    "orders": ("orders", "o_custkey", "c_custkey"),
    "lineitems": ("lineitem", "l_orderkey", "o_orderkey"),
}


def _serialize_children(df: DataFrame, col: str, fields: list[str]) -> DataFrame:
    """array<struct> → '|'-joined 'f1:f2' string for the value-hash
    gate (registered outputs must be scalar); NULL stays NULL, like
    the engine's childless-parent semantics."""
    from pyspark.sql import functions as F

    row = lambda x: F.concat_ws(":", *[x[f].cast("string") for f in fields])  # noqa: E731
    ser = F.concat_ws("|", F.transform(F.col(col), row))
    return df.withColumn(col, F.when(F.col(col).isNull(), F.lit(None)).otherwise(ser))


@register(
    "soql_child_subquery",
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_orderstatus,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
      FROM orders
    ), agg AS (
      SELECT o_custkey,
             string_agg(o_orderkey || ':' || o_orderstatus, '|' ORDER BY o_orderkey) AS orders
      FROM ranked WHERE rn <= 5 GROUP BY o_custkey
    )
    SELECT c.c_custkey, c.c_name, a.orders
    FROM customer c LEFT JOIN agg a ON a.o_custkey = c.c_custkey
    WHERE c.c_custkey <= 50
    ORDER BY c.c_custkey
    """,
    doc="SOQL parent-to-child nested subquery → collect_list left join (first 5 orders per customer)",
)
def soql_child_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = soql_to_df(
        "SELECT c_custkey, c_name, "
        "(SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey LIMIT 5) "
        "FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey",
        _resolver(spark, sf_dir),
        child_relationships=CHILD_RELATIONSHIPS,
    )
    return _serialize_children(df, "orders", ["o_orderkey", "o_orderstatus"])


@register(
    "soql_child_subquery_where",
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn
      FROM orders WHERE o_orderstatus = 'F'
    ), agg AS (
      SELECT o_custkey,
             string_agg(CAST(o_orderkey AS VARCHAR), '|' ORDER BY o_orderkey DESC) AS finished
      FROM ranked WHERE rn <= 3 GROUP BY o_custkey
    )
    SELECT c.c_custkey, a.finished
    FROM customer c LEFT JOIN agg a ON a.o_custkey = c.c_custkey
    WHERE c.c_custkey <= 100
    ORDER BY c.c_custkey
    """,
    doc="SOQL child subquery with WHERE + DESC + alias (latest 3 finished orders)",
)
def soql_child_subquery_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = soql_to_df(
        "SELECT c_custkey, "
        "(SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F' "
        "ORDER BY o_orderkey DESC LIMIT 3) finished "
        "FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey",
        _resolver(spark, sf_dir),
        child_relationships=CHILD_RELATIONSHIPS,
    )
    return _serialize_children(df, "finished", ["o_orderkey"])


@register(
    "soql_child_traversal",
    """
    WITH enriched AS (
      SELECT l.l_orderkey, l.l_linenumber, p.p_name, c.c_name
      FROM lineitem l
      LEFT JOIN part p ON l.l_partkey = p.p_partkey
      LEFT JOIN orders o2 ON l.l_orderkey = o2.o_orderkey
      LEFT JOIN customer c ON o2.o_custkey = c.c_custkey
    ), agg AS (
      SELECT l_orderkey,
             string_agg(l_linenumber || ':' || p_name || ':' || c_name,
                        '|' ORDER BY l_linenumber, p_name, c_name) AS items
      FROM enriched GROUP BY l_orderkey
    )
    SELECT o.o_orderkey, a.items
    FROM orders o LEFT JOIN agg a ON a.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey <= 200
    ORDER BY o.o_orderkey
    """,
    doc=(
        "SOQL dotted paths INSIDE a child subquery (1-hop part.p_name + "
        "2-hop order.customer.c_name), traversed from the CHILD object — "
        "the shape the reference forwards verbatim (client.rs:199-205)"
    ),
)
def soql_child_traversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = soql_to_df(
        "SELECT o_orderkey, "
        "(SELECT l_linenumber, part.p_name, order.customer.c_name "
        "FROM lineitems ORDER BY l_linenumber) items "
        "FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey",
        _resolver(spark, sf_dir),
        relationships={**RELATIONSHIPS, "part": ("part", "l_partkey", "p_partkey")},
        child_relationships=CHILD_RELATIONSHIPS,
    )
    return _serialize_children(
        df, "items", ["l_linenumber", "part_p_name", "order_customer_c_name"]
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


@register(
    "soql_cube_grouping",
    """
    SELECT o_orderstatus AS status,
           o_orderpriority AS prio,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(grouping(o_orderstatus) AS INT) AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_prio
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status NULLS FIRST, prio NULLS FIRST
    """,
    doc="SOQL GROUP BY CUBE + GROUPING() flags (full 2^k subtotal lattice)",
)
def soql_cube_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOQL's full grouping surface: CUBE generates the complete 2^k
    subtotal lattice and GROUPING() disambiguates real NULL group keys
    from subtotal rows — forwarded verbatim by the reference
    (client.rs:199-205), evaluated here as df.cube + F.grouping.
    One Expand + one shuffle, same cost shape as plain GROUP BY
    times the 2^k lattice factor."""
    return soql_to_df(
        "SELECT o_orderstatus status, o_orderpriority prio, COUNT() n_orders, "
        "GROUPING(o_orderstatus) g_status, GROUPING(o_orderpriority) g_prio "
        "FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) "
        "ORDER BY status NULLS FIRST, prio NULLS FIRST",
        _resolver(spark, sf_dir),
    )


@register(
    "soql_date_functions",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(count(*) AS BIGINT) AS n_orders,
           max(o_totalprice) AS max_price
    FROM orders
    GROUP BY year(o_orderdate), month(o_orderdate)
    ORDER BY yr, mo
    """,
    doc="SOQL date functions (CALENDAR_YEAR/CALENDAR_MONTH) in SELECT + GROUP BY",
)
def soql_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salesforce evaluates CALENDAR_YEAR()/CALENDAR_MONTH() etc.
    server-side on date fields (the reference forwards them verbatim,
    client.rs:199-205); the front door maps them onto Catalyst's
    year()/month() builtins — text-canonical matching pairs the
    SELECT expression with its GROUP BY twin."""
    return soql_to_df(
        "SELECT CALENDAR_YEAR(o_orderdate) yr, CALENDAR_MONTH(o_orderdate) mo, "
        "COUNT() n_orders, MAX(o_totalprice) max_price "
        "FROM orders GROUP BY CALENDAR_YEAR(o_orderdate), CALENDAR_MONTH(o_orderdate) "
        "ORDER BY yr, mo",
        _resolver(spark, sf_dir),
    )


@register(
    "soql_typeof",
    """
    SELECT e.event_id, e.event_type,
           c.c_name AS actor_c_name, c.c_acctbal AS actor_c_acctbal,
           s.s_name AS actor_s_name
    FROM events e
    LEFT JOIN customer c
      ON e.user_id = c.c_custkey AND e.event_type IN ('purchase', 'signup')
    LEFT JOIN supplier s
      ON e.user_id = s.s_suppkey AND e.event_type NOT IN ('purchase', 'signup')
    WHERE e.user_id < 120
    ORDER BY e.event_id
    LIMIT 300
    """,
    doc="SOQL TYPEOF polymorphic dispatch → one type-gated left join per branch",
)
def soql_typeof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic-reference dispatch (Salesforce ``Task.What``-style;
    the reference forwards TYPEOF verbatim like all SOQL,
    client.rs:199-205). The fixture has no polymorphic FK, so the
    resolver derives the discriminator: purchase/signup events act on
    a customer, everything else on a supplier — user_ids above the
    supplier key range surface the NULL-branch wire shape. Scale: two
    dimension left joins, both broadcast under the session threshold;
    the events scan stays pruned to the referenced columns."""
    from pyspark.sql import functions as F

    base_resolve = _resolver(spark, sf_dir)

    def resolve(name: str) -> DataFrame:
        df = base_resolve(name)
        if name == "events":
            df = df.withColumn(
                "actor_type",
                F.when(
                    F.col("event_type").isin("purchase", "signup"), "customer"
                ).otherwise("supplier"),
            )
        return df

    return soql_to_df(
        "SELECT event_id, event_type, "
        "TYPEOF actor WHEN customer THEN c_name, c_acctbal "
        "WHEN supplier THEN s_name END "
        "FROM events WHERE user_id < 120 ORDER BY event_id LIMIT 300",
        resolve,
        polymorphic={
            "actor": {
                "type_col": "actor_type",
                "fk_col": "user_id",
                "targets": {"customer": "c_custkey", "supplier": "s_suppkey"},
            }
        },
    )


@register(
    "soql_fields_all",
    """
    SELECT r_regionkey, r_name
    FROM region
    ORDER BY r_regionkey
    """,
    doc="SOQL front door: FIELDS(ALL) bulk projection expands to the object's schema",
)
def soql_fields_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT FIELDS(ALL) FROM Region`` — Salesforce's bulk-
    projection shorthand, expanded at parse time to the queried
    object's columns in schema order (plans/soql.py:parse_fields_fn).
    The oracle states the expansion explicitly, so a wrong, reordered,
    or chain-polluted expansion breaks the schema/hash match."""
    return soql_to_df(
        "SELECT FIELDS(ALL) FROM region ORDER BY r_regionkey",
        _resolver(spark, sf_dir),
    )
