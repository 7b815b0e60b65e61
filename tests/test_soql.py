"""SOQL front-door tests: every compiled query is checked against the
equivalent spark.sql / expected rows on the synthetic tables plus a
Case-shaped fixture (multipicklist, date literals)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sf_etl_spark.plans import SoqlError, soql_to_df
from sf_etl_spark.sources import load_table


@pytest.fixture(scope="module")
def resolve(spark, sf_dir):
    def _resolve(name: str):
        if name == "Case":
            return spark.createDataFrame(
                [
                    ("1", "High", "red;blue", 10.0, None),
                    ("2", "Low", "green", 5.0, "2020-01-01"),
                    ("3", "High", "blue", None, "2020-06-01"),
                    ("4", None, "red", 7.5, "2021-01-01"),
                ],
                "Id string, Priority string, Tags string, Amount double, Closed string",
            ).withColumn("Closed", F.col("Closed").cast("date"))
        return load_table(spark, sf_dir, name)

    return _resolve


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_projection_and_filter(spark, resolve, sf_dir):
    got = soql_to_df(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_orderstatus = 'F' AND o_totalprice > 100000 ORDER BY o_orderkey",
        resolve,
    )
    want = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )
    assert rows(got) == rows(want)
    assert got.count() > 0


def test_in_like_null_predicates(resolve):
    got = soql_to_df("SELECT Id FROM Case WHERE Priority IN ('High', 'Low') ORDER BY Id", resolve)
    assert [r.Id for r in got.collect()] == ["1", "2", "3"]
    got = soql_to_df("SELECT Id FROM Case WHERE Priority = null", resolve)
    assert [r.Id for r in got.collect()] == ["4"]
    got = soql_to_df("SELECT Id FROM Case WHERE Id LIKE '%3'", resolve)
    assert [r.Id for r in got.collect()] == ["3"]
    got = soql_to_df("SELECT Id FROM Case WHERE Priority NOT IN ('Low') ORDER BY Id", resolve)
    assert [r.Id for r in got.collect()] == ["1", "3"]  # SQL semantics: null excluded


def test_includes_excludes_multipicklist(resolve):
    got = soql_to_df("SELECT Id FROM Case WHERE Tags INCLUDES ('red') ORDER BY Id", resolve)
    assert [r.Id for r in got.collect()] == ["1", "4"]
    got = soql_to_df(
        "SELECT Id FROM Case WHERE Tags EXCLUDES ('red', 'green') ORDER BY Id", resolve
    )
    assert [r.Id for r in got.collect()] == ["3"]


def test_date_literals(resolve):
    got = soql_to_df("SELECT Id FROM Case WHERE Closed < TODAY ORDER BY Id", resolve)
    assert [r.Id for r in got.collect()] == ["2", "3", "4"]
    got = soql_to_df("SELECT Id FROM Case WHERE Closed >= LAST_N_DAYS:36500", resolve)
    assert len(got.collect()) == 3


def test_aggregates_group_having(spark, resolve, sf_dir):
    got = soql_to_df(
        "SELECT o_orderstatus, COUNT() n, SUM(o_totalprice) total FROM orders "
        "GROUP BY o_orderstatus HAVING COUNT(o_orderkey) > 10 ORDER BY o_orderstatus",
        resolve,
    )
    want = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("total"))
        .filter(F.col("n") > 10)
        .orderBy("o_orderstatus")
    )
    assert rows(got) == rows(want)
    assert got.columns == ["o_orderstatus", "n", "total"]


def test_global_aggregate(spark, resolve, sf_dir):
    got = soql_to_df("SELECT COUNT() FROM lineitem", resolve)
    assert got.collect()[0][0] == load_table(spark, sf_dir, "lineitem").count()
    got = soql_to_df("SELECT COUNT_DISTINCT(o_custkey) nc FROM orders", resolve)
    want = load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    assert got.collect()[0].nc == want


def test_order_limit_offset(spark, resolve, sf_dir):
    got = soql_to_df(
        "SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC LIMIT 5 OFFSET 2", resolve
    )
    want = (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc_nulls_last())
        .select("o_orderkey")
        .offset(2)
        .limit(5)
    )
    assert rows(got) == rows(want)
    assert got.count() == 5


def test_parse_errors(resolve):
    for bad in [
        "UPDATE Case SET x = 1",
        "SELECT FROM Case",
        "SELECT Id Case",
        "SELECT Id FROM Case WHERE",
        "SELECT Id FROM Case WHERE Priority ~ 'x'",
        "SELECT SUM(Amount) FROM Case WHERE SUM(Amount) > 1",
        "SELECT Id FROM Case LIMIT 5 garbage",
    ]:
        with pytest.raises(SoqlError):
            soql_to_df(bad, resolve)


def test_pushdown_reaches_parquet_scan(spark, resolve, sf_dir):
    """The compiled plan is declarative → Catalyst pushes the SOQL WHERE
    into the parquet scan (the 100 TB requirement)."""
    df = soql_to_df(
        "SELECT o_orderkey FROM orders WHERE o_totalprice > 100000", resolve
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_totalprice" in plan.split("PushedFilters")[1][:200]


def test_parent_traversal_equals_join(spark, resolve, sf_dir):
    rels = {"customer": ("customer", "o_custkey", "c_custkey")}
    got = soql_to_df(
        "SELECT o_orderkey, customer.c_name FROM orders "
        "WHERE customer.c_acctbal > 9000 ORDER BY o_orderkey",
        resolve,
        relationships=rels,
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    want = (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .filter(F.col("c_acctbal") > 9000)
        .select("o_orderkey", F.col("c_name").alias("customer_c_name"))
        .orderBy("o_orderkey")
    )
    assert rows(got) == rows(want)
    assert got.columns == ["o_orderkey", "customer_c_name"]


def test_unknown_relationship_raises(resolve):
    with pytest.raises(SoqlError, match="unknown relationship"):
        soql_to_df("SELECT account.Name FROM orders", resolve)


def test_group_by_rollup(spark, resolve, sf_dir):
    got = soql_to_df(
        "SELECT o_orderstatus, COUNT() n FROM orders "
        "GROUP BY ROLLUP(o_orderstatus) ORDER BY o_orderstatus NULLS FIRST",
        resolve,
    )
    o = load_table(spark, sf_dir, "orders")
    n_status = o.select("o_orderstatus").distinct().count()
    assert got.count() == n_status + 1  # grand-total row
    first = got.collect()[0]
    assert first["o_orderstatus"] is None and first["n"] == o.count()


def test_date_literal_range_semantics(spark):
    import datetime

    # "today" must come from the ENGINE's clock (the session pins UTC);
    # host-local date.today() disagrees around midnight on non-UTC hosts
    today = spark.sql("SELECT current_date() AS d").collect()[0]["d"]
    rows_in = [
        ("today", today),
        ("yesterday", today - datetime.timedelta(days=1)),
        ("past40", today - datetime.timedelta(days=40)),
        ("future5", today + datetime.timedelta(days=5)),
    ]
    df = spark.createDataFrame(rows_in, "tag string, d date")
    res = {"t": df}

    def q(soql):
        return sorted(
            r["tag"] for r in soql_to_df(soql, lambda n: res[n]).collect()
        )

    assert q("SELECT tag FROM t WHERE d = TODAY") == ["today"]
    assert q("SELECT tag FROM t WHERE d = YESTERDAY") == ["yesterday"]
    assert q("SELECT tag FROM t WHERE d = LAST_N_DAYS:7") == ["today", "yesterday"]
    assert q("SELECT tag FROM t WHERE d = NEXT_N_DAYS:7") == ["future5"]
    assert q("SELECT tag FROM t WHERE d > YESTERDAY") == ["future5", "today"]
    assert q("SELECT tag FROM t WHERE d < LAST_N_DAYS:7") == ["past40"]


# -- parent-to-child nested subqueries --------------------------------------

CHILD_RELS = {"orders": ("orders", "o_custkey", "c_custkey")}


def test_child_subquery_nested_lists(spark, resolve, sf_dir):
    got = soql_to_df(
        "SELECT c_custkey, (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 2) "
        "FROM customer ORDER BY c_custkey LIMIT 10",
        resolve,
        child_relationships=CHILD_RELS,
    ).collect()
    orders = load_table(spark, sf_dir, "orders")
    for r in got:
        want = [
            x["o_orderkey"]
            for x in orders.filter(F.col("o_custkey") == r["c_custkey"])
            .orderBy("o_orderkey")
            .limit(2)
            .collect()
        ]
        lst = r["orders"]
        vals = [x["o_orderkey"] for x in lst] if lst is not None else []
        assert vals == want


def test_child_subquery_where_and_desc(spark, resolve, sf_dir):
    got = soql_to_df(
        "SELECT c_custkey, (SELECT o_orderkey FROM orders "
        "WHERE o_orderstatus = 'F' ORDER BY o_orderkey DESC LIMIT 3) fin "
        "FROM customer ORDER BY c_custkey LIMIT 5",
        resolve,
        child_relationships=CHILD_RELS,
    ).collect()
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    for r in got:
        want = [
            x["o_orderkey"]
            for x in orders.filter(F.col("o_custkey") == r["c_custkey"])
            .orderBy(F.col("o_orderkey").desc())
            .limit(3)
            .collect()
        ]
        lst = r["fin"]
        vals = [x["o_orderkey"] for x in lst] if lst is not None else []
        assert vals == want


def test_child_subquery_childless_parent_is_null(spark, resolve):
    parent = spark.createDataFrame([(1,), (2,)], "c_custkey long")
    child = spark.createDataFrame([(1, 100)], "o_custkey long, o_orderkey long")
    res = {"customer": parent, "orders": child}
    got = {
        r["c_custkey"]: r["orders"]
        for r in soql_to_df(
            "SELECT c_custkey, (SELECT o_orderkey FROM orders) FROM customer",
            lambda n: res[n],
            child_relationships=CHILD_RELS,
        ).collect()
    }
    assert [x["o_orderkey"] for x in got[1]] == [100]
    assert got[2] is None  # Salesforce returns null, not an empty list


def test_child_subquery_errors(resolve):
    with pytest.raises(SoqlError, match="unknown child relationship"):
        soql_to_df(
            "SELECT c_custkey, (SELECT x FROM nope) FROM customer",
            resolve,
            child_relationships=CHILD_RELS,
        )
    with pytest.raises(SoqlError, match="not found on"):
        soql_to_df(
            "SELECT c_custkey, (SELECT no_such_col FROM orders) FROM customer",
            resolve,
            child_relationships=CHILD_RELS,
        )
    with pytest.raises(SoqlError, match="mixed ASC/DESC"):
        soql_to_df(
            "SELECT c_custkey, (SELECT o_orderkey, o_custkey FROM orders "
            "ORDER BY o_orderkey ASC, o_custkey DESC) FROM customer",
            resolve,
            child_relationships=CHILD_RELS,
        )
    with pytest.raises(SoqlError, match="GROUP BY or aggregates"):
        soql_to_df(
            "SELECT COUNT(), (SELECT o_orderkey FROM orders) FROM customer",
            resolve,
            child_relationships=CHILD_RELS,
        )
    # a dotted path inside the child select is rejected — either by the
    # child-grammar check or earlier by the relationship binder
    with pytest.raises(SoqlError, match="dotted paths|unknown relationship"):
        soql_to_df(
            "SELECT c_custkey, (SELECT customer.c_name FROM orders) FROM customer",
            resolve,
            child_relationships=CHILD_RELS,
        )


# -- multi-hop dotted traversal ---------------------------------------------

MULTIHOP_RELS = {
    "customer": ("customer", "o_custkey", "c_custkey"),
    "nation": ("nation", "c_nationkey", "n_nationkey"),
    "region": ("region", "n_regionkey", "r_regionkey"),
}


def test_multihop_traversal(spark, resolve, sf_dir):
    got = soql_to_df(
        "SELECT o_orderkey, customer.nation.n_name "
        "FROM orders ORDER BY o_orderkey LIMIT 20",
        resolve,
        relationships=MULTIHOP_RELS,
    )
    assert got.columns == ["o_orderkey", "customer_nation_n_name"]
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    want = (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .join(n, c.c_nationkey == n.n_nationkey, "left")
        .select("o_orderkey", F.col("n_name").alias("customer_nation_n_name"))
        .orderBy("o_orderkey")
        .limit(20)
    )
    assert rows(got) == rows(want)


def test_multihop_in_where_and_order(spark, resolve):
    # the chained field is usable in WHERE (filters on the joined dim)
    got = soql_to_df(
        "SELECT o_orderkey, customer.nation.n_name nat "
        "FROM orders WHERE customer.nation.n_name = 'NATION_19' "
        "ORDER BY o_orderkey LIMIT 5",
        resolve,
        relationships=MULTIHOP_RELS,
    ).collect()
    assert got and all(r["nat"] == "NATION_19" for r in got)


def test_multihop_missing_intermediate_fk(resolve):
    # region hop declared, but chain skips nation: FK not on customer
    with pytest.raises(SoqlError, match="relationship path"):
        soql_to_df(
            "SELECT customer.region.r_name FROM orders",
            resolve,
            relationships=MULTIHOP_RELS,
        )


# -- IN (SELECT ...) semi-join subqueries -----------------------------------


def test_in_subquery_semi_join(spark, resolve, sf_dir):
    got = soql_to_df(
        "SELECT c_custkey FROM customer WHERE c_custkey IN "
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 200000) "
        "ORDER BY c_custkey",
        resolve,
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    want = (
        load_table(spark, sf_dir, "customer")
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    )
    assert rows(got) == rows(want)
    assert got.count() > 0
    # the lifted predicate must compile to a semi join, not a filter
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_not_in_subquery_anti_join(spark, resolve, sf_dir):
    got = soql_to_df(
        "SELECT c_custkey FROM customer WHERE c_custkey NOT IN "
        "(SELECT o_custkey FROM orders) ORDER BY c_custkey",
        resolve,
    )
    want = (
        load_table(spark, sf_dir, "customer")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .select("c_custkey")
        .orderBy("c_custkey")
    )
    assert rows(got) == rows(want)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan


def test_in_subquery_combines_with_other_conjuncts(spark, resolve, sf_dir):
    got = soql_to_df(
        "SELECT c_custkey FROM customer WHERE c_acctbal > 5000 AND c_custkey IN "
        "(SELECT o_custkey FROM orders) AND c_custkey < 100 ORDER BY c_custkey",
        resolve,
    ).collect()
    assert all(r["c_custkey"] < 100 for r in got)
    assert got  # fixture has matching rows


def test_in_subquery_rejected_under_or_and_not(resolve):
    for bad in [
        "SELECT c_custkey FROM customer WHERE c_acctbal > 0 OR c_custkey IN "
        "(SELECT o_custkey FROM orders)",
        "SELECT c_custkey FROM customer WHERE NOT (c_custkey IN "
        "(SELECT o_custkey FROM orders))",
    ]:
        with pytest.raises(SoqlError, match="top-level AND-ed"):
            soql_to_df(bad, resolve)


def test_group_by_cube_with_grouping(spark, sf_dir):
    from sf_etl_spark.queries.soql_front import _resolver

    df = soql_to_df(
        "SELECT o_orderstatus s, COUNT() n, GROUPING(o_orderstatus) g "
        "FROM orders GROUP BY CUBE(o_orderstatus) ORDER BY s NULLS FIRST",
        _resolver(spark, sf_dir),
    )
    rows = df.collect()
    # grand total row: grouping flag 1, n == table count
    total = [r for r in rows if r.g == 1]
    assert len(total) == 1
    assert total[0].n == sum(r.n for r in rows if r.g == 0)
    assert all(r.g == 0 for r in rows if r.s is not None)


def test_child_subquery_dotted_where_and_order(spark, sf_dir):
    """Dotted paths inside a child subquery work in WHERE and ORDER BY,
    not just the select list (bound against the child frame)."""
    from sf_etl_spark.queries.soql_front import CHILD_RELATIONSHIPS, RELATIONSHIPS, _resolver

    df = soql_to_df(
        "SELECT c_custkey, "
        "(SELECT o_orderkey FROM orders WHERE order.customer.c_acctbal > 0 "
        "ORDER BY o_orderkey LIMIT 3) pos_orders "
        "FROM customer WHERE c_custkey <= 20 ORDER BY c_custkey",
        _resolver(spark, sf_dir),
        relationships={
            **RELATIONSHIPS,
            "order": ("orders", "o_orderkey", "o_orderkey"),
        },
        child_relationships=CHILD_RELATIONSHIPS,
    )
    rows = df.collect()
    assert len(rows) == 21  # custkey 0..20
    assert df.columns == ["c_custkey", "pos_orders"]


def test_date_fn_rollup_and_default_name(spark, sf_dir):
    from sf_etl_spark.queries.soql_front import _resolver

    # date fn inside ROLLUP (aliased inline) next to a bare column
    df = soql_to_df(
        "SELECT o_orderstatus, CALENDAR_YEAR(o_orderdate) yr, COUNT() n "
        "FROM orders GROUP BY ROLLUP(o_orderstatus, CALENDAR_YEAR(o_orderdate)) "
        "ORDER BY o_orderstatus NULLS FIRST, yr NULLS FIRST",
        _resolver(spark, sf_dir),
    )
    rows = df.collect()
    assert rows[0].o_orderstatus is None and rows[0].yr is None  # grand total
    assert rows[0].n == sum(r.n for r in rows if r.o_orderstatus is not None and r.yr is not None)

    # default (unaliased) name is the flattened fn_field form
    df2 = soql_to_df(
        "SELECT CALENDAR_MONTH(o_orderdate), COUNT() n FROM orders "
        "GROUP BY CALENDAR_MONTH(o_orderdate)",
        _resolver(spark, sf_dir),
    )
    assert "calendar_month_o_orderdate" in df2.columns


# -- TYPEOF polymorphic dispatch --------------------------------------------

_POLY = {
    "who": {
        "type_col": "who_type",
        "fk_col": "who_id",
        "targets": {"Lead": "lead_pk", "Contact": "contact_pk"},
    }
}


@pytest.fixture(scope="module")
def poly_resolve(spark):
    def _resolve(name: str):
        if name == "Task":
            return spark.createDataFrame(
                [
                    (1, 10, "Lead"),
                    (2, 20, "Contact"),
                    (3, 99, "Lead"),  # dangling FK → NULL branch fields
                    (4, 10, "Contact"),  # same key, other type
                ],
                "task_id int, who_id int, who_type string",
            )
        if name == "Lead":
            return spark.createDataFrame(
                [(10, "lead-a", "web"), (11, "lead-b", "ad")],
                "lead_pk int, lead_name string, source string",
            )
        if name == "Contact":
            return spark.createDataFrame(
                [(10, "contact-x"), (20, "contact-y")],
                "contact_pk int, contact_name string",
            )
        raise KeyError(name)

    return _resolve


def test_typeof_branches_and_nulls(poly_resolve):
    got = soql_to_df(
        "SELECT task_id, TYPEOF who WHEN Lead THEN lead_name, source "
        "WHEN Contact THEN contact_name END FROM Task ORDER BY task_id",
        poly_resolve,
        polymorphic=_POLY,
    )
    assert got.columns == ["task_id", "who_lead_name", "who_source", "who_contact_name"]
    assert rows(got) == [
        (1, "lead-a", "web", None),  # Lead branch populated
        (2, None, None, "contact-y"),  # Contact branch populated
        (3, None, None, None),  # dangling FK: all branch fields NULL
        (4, None, None, "contact-x"),  # type gate picks Contact for key 10
    ]


def test_typeof_single_branch_with_where(poly_resolve):
    got = soql_to_df(
        "SELECT task_id, TYPEOF who WHEN Lead THEN lead_name END "
        "FROM Task WHERE task_id < 3 ORDER BY task_id",
        poly_resolve,
        polymorphic=_POLY,
    )
    assert rows(got) == [(1, "lead-a"), (2, None)]


def test_typeof_errors(poly_resolve):
    with pytest.raises(SoqlError, match="polymorphic registry"):
        soql_to_df(
            "SELECT TYPEOF owner WHEN Lead THEN lead_name END FROM Task",
            poly_resolve,
            polymorphic=_POLY,
        )
    with pytest.raises(SoqlError, match="admissible target"):
        soql_to_df(
            "SELECT TYPEOF who WHEN Account THEN x END FROM Task",
            poly_resolve,
            polymorphic=_POLY,
        )
    with pytest.raises(SoqlError, match="ELSE is not supported"):
        soql_to_df(
            "SELECT TYPEOF who WHEN Lead THEN lead_name ELSE name END FROM Task",
            poly_resolve,
            polymorphic=_POLY,
        )
    with pytest.raises(SoqlError, match="at least one WHEN"):
        soql_to_df("SELECT TYPEOF who END FROM Task", poly_resolve, polymorphic=_POLY)
    with pytest.raises(SoqlError, match="GROUP BY or aggregates"):
        soql_to_df(
            "SELECT COUNT(), TYPEOF who WHEN Lead THEN lead_name END FROM Task",
            poly_resolve,
            polymorphic=_POLY,
        )


def test_fields_all_expands_schema_order(spark, sf_dir):
    from sf_etl_spark.plans import soql_to_df
    from sf_etl_spark.sources import load_table

    resolve = lambda name: load_table(spark, sf_dir, name)  # noqa: E731
    df = soql_to_df("SELECT FIELDS(ALL) FROM nation", resolve)
    assert df.columns == list(load_table(spark, sf_dir, "nation").columns)
    # mixes with explicit items and WHERE
    df2 = soql_to_df(
        "SELECT FIELDS(STANDARD) FROM region WHERE r_regionkey > 0", resolve
    )
    assert df2.count() > 0


def test_fields_custom_raises(spark, sf_dir):
    import pytest

    from sf_etl_spark.plans import soql_to_df
    from sf_etl_spark.plans.soql import SoqlError
    from sf_etl_spark.sources import load_table

    resolve = lambda name: load_table(spark, sf_dir, name)  # noqa: E731
    with pytest.raises(SoqlError, match="FIELDS.CUSTOM"):
        soql_to_df("SELECT FIELDS(CUSTOM) FROM region", resolve)


def test_typeof_same_field_across_branches_coalesces(spark, sf_dir):
    """`WHEN Lead THEN name WHEN Contact THEN name` (the canonical
    TYPEOF usage) must yield ONE column carrying the row's actual-type
    value — branches are type-gated and mutually exclusive — not two
    duplicate output columns that break by-name access."""
    from pyspark.sql import functions as F

    from sf_etl_spark.plans import soql_to_df
    from sf_etl_spark.sources import load_table

    def resolve(name):
        df = load_table(spark, sf_dir, name)
        if name == "events":
            return df.withColumn(
                "actor_type",
                F.when(
                    F.col("event_type").isin("purchase", "signup"), "customer"
                ).otherwise("supplier"),
            )
        if name == "customer":
            return df.withColumn("display_name", F.col("c_name"))
        if name == "supplier":
            return df.withColumn("display_name", F.col("s_name"))
        return df

    df = soql_to_df(
        "SELECT event_id, TYPEOF actor WHEN customer THEN display_name "
        "WHEN supplier THEN display_name END "
        "FROM events WHERE user_id < 50 ORDER BY event_id LIMIT 20",
        resolve,
        polymorphic={
            "actor": {
                "type_col": "actor_type",
                "fk_col": "user_id",
                "targets": {"customer": "c_custkey", "supplier": "s_suppkey"},
            }
        },
    )
    assert df.columns.count("actor_display_name") == 1
    rows = df.collect()
    names = [r["actor_display_name"] for r in rows if r["actor_display_name"]]
    # both branch types surface through the ONE coalesced column
    # (unmatched FKs legitimately stay NULL — the wire shape)
    assert any(n.startswith("Customer#") for n in names)
    assert any(n.startswith("Supplier#") for n in names)
