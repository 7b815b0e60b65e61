"""Adapted TPC-H decision-support suite (Q4–Q22 shapes).

Round 1 covered Q1/Q3/Q5/Q14; this module completes the classic
decision-support plan shapes feasible on the fixture schema
(FIXTURES.md §B has no ``partsupp``, no ``l_commitdate``/
``l_receiptdate``/``l_shipmode`` — queries needing them are adapted:
"late" means shipped > N days after ``o_orderdate``, supplier cost
terms are dropped from Q9's profit, and Q22's phone prefix becomes
the nation key).

These exercise the remaining classic optimizer patterns the engine
must handle: correlated EXISTS with a non-equi condition (Q4),
self-join decorrelation with double correlation (Q21), scalar
correlated subqueries (Q17), IN + HAVING subqueries (Q18),
disjunctions of conjunctions across a join (Q19), outer-join
count distributions (Q13), CTE-reuse with a scalar max (Q15), and
multi-fact star joins with case-ratio aggregation (Q7/Q8/Q9/Q12).

All money arithmetic goes through the exact-decimal ``dsum``/``SUMD``
lane (see ``relational.py`` docstring) so Spark and DuckDB agree
bit-for-bit regardless of summation order. Quantity/count sums are
integer-valued doubles (≤2^53 — exact in any order), so plain
``avg``/``sum`` is engine-portable there.

Scale notes inline per query; the shared rules: region/nation/
supplier/part are dims → broadcast; fact-fact joins shuffle on their
natural keys once; aggregations are partial map-side; every ORDER BY
... LIMIT is a distributed TakeOrdered with a deterministic
tie-break, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sf_etl_spark.queries import register
from sf_etl_spark.queries.relational import AVGD, SUMD, davg, dsum, _t


def TS(s: str) -> Column:
    return F.lit(s).cast("timestamp_ntz")


def _rev() -> Column:
    # lazy: building a Column requires a live SparkContext, and this
    # module is imported (registration time) before any session exists
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_REV_SQL = "l_extendedprice * (1 - l_discount)"


# ---------------------------------------------------------------------------
# Q4 — order-priority checking: EXISTS with a non-equi correlated
# condition. Adapted: a line is "late" when shipped > 90 days after
# the order date (no l_commitdate/l_receiptdate in the fixture).
# Scale: left-semi join — lineitem never duplicates orders, and the
# date predicate rides the join so only matching rows shuffle; the
# agg output is 5 rows.
# ---------------------------------------------------------------------------
@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS (non-equi) -> semi join -> agg",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, l = _t(spark, sf_dir, "orders", "lineitem")
    o = o.filter((F.col("o_orderdate") >= TS("1997-01-01")) & (F.col("o_orderdate") < TS("1998-01-01")))
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(l.select("l_orderkey", "l_shipdate"), late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change: pure scan + conjunctive filter +
# one-row agg. Scale: every predicate pushes to the parquet scan
# (min/max rowgroup skipping on l_shipdate); zero joins, one partial
# agg -> single-row exchange.
# ---------------------------------------------------------------------------
@register(
    "q6_forecast_revenue",
    f"""
    SELECT {SUMD('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: fully pushed-down filter + single-row aggregate",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    (l,) = _t(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= TS("1997-01-01"))
        & (F.col("l_shipdate") < TS("1998-01-01"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by year. Scale: both
# nation sides are pre-filtered to the two names BEFORE the join
# (manual pushdown through the disjunctive pair predicate) and
# broadcast; lineitem->orders->customer shuffle on natural keys.
# ---------------------------------------------------------------------------
@register(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year, {SUMD('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             {_REV_SQL} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7: two-sided nation pair join, broadcast dims, year rollup",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l, o, c, s, n = _t(spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation")
    pair = F.col("n_name").isin("NATION_1", "NATION_2")
    n1 = F.broadcast(n.filter(pair).select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.filter(pair).select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    l = l.filter((F.col("l_shipdate") >= TS("1996-01-01")) & (F.col("l_shipdate") < TS("1998-01-01")))
    return (
        l.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .withColumn("l_year", F.year("l_shipdate").cast("bigint"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(_rev()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share: NATION_3's share of AMERICA-region
# PROMO-part revenue by order year. Scale: part/region/nation/supplier
# all broadcast after their filters; the case-ratio is two exact
# decimal sums per group divided once (identical doubles both engines).
# ---------------------------------------------------------------------------
@register(
    "q8_market_share",
    f"""
    SELECT o_year,
           {SUMD("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")}
             / {SUMD('volume')} AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             {_REV_SQL} AS volume,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8: 7-way star join, broadcast dim chain, case-ratio share",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l, o, c, s, n, r, p = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation", "region", "part"
    )
    cust_nat = F.broadcast(
        n.join(F.broadcast(r.filter(F.col("r_name") == "AMERICA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    supp_nat = F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    o = o.filter((F.col("o_orderdate") >= TS("1996-01-01")) & (F.col("o_orderdate") < TS("1998-01-01")))
    volume = F.col("volume")
    return (
        l.join(F.broadcast(p.filter(F.col("p_type") == "PROMO").select("p_partkey")), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(supp_nat, F.col("s_nationkey") == F.col("s_nk"))
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c.select("c_custkey", "c_nationkey"), F.col("c_custkey") == F.col("o_custkey"))
        .join(cust_nat, F.col("c_nationkey") == F.col("c_nk"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            _rev().alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            (
                dsum(F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(F.lit(0.0)))
                / dsum(volume)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year. Adapted: the fixture
# has no partsupp, so profit omits the supply-cost term. Scale: part
# filter broadcast, supplier+nation broadcast, one shuffle join on
# l_orderkey; agg keys (25 nations x years) are tiny.
# ---------------------------------------------------------------------------
@register(
    "q9_product_profit",
    f"""
    SELECT nation, o_year, {SUMD('amount')} AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             {_REV_SQL} AS amount
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape (no partsupp): LIKE-filtered star join profit rollup",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l, o, s, n, p = _t(spark, sf_dir, "lineitem", "orders", "supplier", "nation", "part")
    return (
        l.join(
            F.broadcast(p.filter(F.col("p_name").like("%widget%")).select("p_partkey")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o.select("o_orderkey", "o_orderdate"), F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            _rev().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount").alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting: top-20 customers by refund-quarter
# revenue. Scale: orders quarter filter pushes down; nation broadcast;
# TakeOrdered(20) with c_custkey tie-break.
# ---------------------------------------------------------------------------
@register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name, {SUMD(_REV_SQL)} AS revenue, c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10: returned-lineitem quarter revenue, top-20 customers",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    l, o, c, n = _t(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    o = o.filter((F.col("o_orderdate") >= TS("1997-01-01")) & (F.col("o_orderdate") < TS("1997-04-01")))
    return (
        l.filter(F.col("l_returnflag") == "R")
        .join(o.select("o_orderkey", "o_custkey"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_rev()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 — shipping-delay priority split. Adapted: "late" = shipped
# > 365 days after order date; grouped by l_linestatus instead of the
# absent l_shipmode. Scale: one fact-fact shuffle join; the case-sums
# are integer-valued -> plain SUM, cast BIGINT on both engines.
# ---------------------------------------------------------------------------
@register(
    "q12_late_priority",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 365 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    doc="TPC-H Q12 shape: late-shipment priority case-count split",
)
def q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, l = _t(spark, sf_dir, "orders", "lineitem")
    l = l.filter((F.col("l_shipdate") >= TS("1997-01-01")) & (F.col("l_shipdate") < TS("1998-01-01")))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o.select("o_orderkey", "o_orderdate", "o_orderpriority"), F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: outer join with an ON-clause
# filter, then a histogram of per-customer counts. Scale: the outer
# join shuffles once on custkey; the second agg groups ~50 distinct
# counts — trivially small.
# ---------------------------------------------------------------------------
@register(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13: outer join with ON-filter -> two-level count histogram",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = _t(spark, sf_dir, "orders", "customer")
    per_cust = (
        c.select("c_custkey")
        .join(
            o.filter(F.col("o_orderpriority") != "1-URGENT").select("o_custkey", "o_orderkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier(s) by quarter revenue: CTE reused for a scalar
# max. Scale: the per-supplier revenue agg is computed once and
# reused (Spark: same DataFrame object twice -> one shuffle, AQE
# reuses the exchange); the max is a broadcast 1-row cross join, no
# driver collect. Double equality is safe because both sides of both
# engines go through the exact-decimal sum lane.
# ---------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {SUMD(_REV_SQL)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15: reused revenue CTE + scalar-max filter, broadcast 1-row join",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l, s = _t(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        l.filter((F.col("l_shipdate") >= TS("1997-01-01")) & (F.col("l_shipdate") < TS("1997-04-01")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(_rev()).alias("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("__max_rev"))
        .join(F.broadcast(s.select("s_suppkey", "s_name")), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier diversity per part group. Adapted: lineitem is the
# part<->supplier bridge (no partsupp); "complaint" suppliers =
# negative account balance, excluded via NOT IN -> anti join.
# Scale: part filter broadcast; distinct-supplier count shuffles on
# the (brand, type, size) group key; the NOT IN side is 6 rows.
# ---------------------------------------------------------------------------
@register(
    "q16_supplier_counts",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 10, 15, 20, 25)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: NOT IN anti join + countDistinct per part group",
)
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l, p, s = _t(spark, sf_dir, "lineitem", "part", "supplier")
    pf = p.filter((F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 10, 15, 20, 25))
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(F.broadcast(pf.select("p_partkey", "p_brand", "p_type", "p_size")), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: correlated scalar subquery
# (per-part average quantity). Scale: the per-part avg is an
# aggregate over the full fact, joined back broadcast (one row per
# part); quantities are integer-valued so plain avg is portable.
# ---------------------------------------------------------------------------
@register(
    "q17_small_qty_revenue",
    f"""
    SELECT {SUMD('l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#11' AND p_type = 'SMALL'
      AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    doc="TPC-H Q17: correlated scalar avg -> broadcast per-part join-back",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l, p = _t(spark, sf_dir, "lineitem", "part")
    per_part = l.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    pf = F.broadcast(
        p.filter((F.col("p_brand") == "Brand#11") & (F.col("p_type") == "SMALL")).select("p_partkey")
    )
    return (
        l.join(pf, F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part, F.col("ap_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers: IN subquery with HAVING over a sum.
# Scale: the HAVING subquery is a semi-join build side aggregated
# map-side first; quantity sums are integer-valued doubles -> exact.
# ---------------------------------------------------------------------------
@register(
    "q18_large_volume",
    f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {SUMD('l_quantity')} AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18: IN + HAVING subquery -> semi join on aggregated keys",
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l, o, c = _t(spark, sf_dir, "lineitem", "orders", "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        l.join(big, F.col("big_orderkey") == F.col("l_orderkey"), "left_semi")
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue over a disjunction of conjunctions
# spanning both join sides. Scale: the OR-of-ANDs cannot all push to
# one side; the per-side prunable parts (brand/size union, quantity
# range union) do push, and the residual disjunction rides the
# broadcast hash join.
# ---------------------------------------------------------------------------
@register(
    "q19_or_of_ands",
    f"""
    SELECT {SUMD(_REV_SQL)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19: disjunction-of-conjunctions residual on a broadcast join",
)
def q19_or_of_ands(spark: SparkSession, sf_dir: str) -> DataFrame:
    l, p = _t(spark, sf_dir, "lineitem", "part")
    b = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        l.join(F.broadcast(p.select("p_partkey", "p_brand", "p_size")), F.col("p_partkey") == F.col("l_partkey"))
        .filter(b("Brand#12", 5, 1, 11) | b("Brand#23", 10, 10, 20) | b("Brand#4", 15, 20, 30))
        .agg(dsum(_rev()).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting: the classic double
# correlation (EXISTS another supplier in the order, NOT EXISTS
# another LATE supplier). Adapted lateness = shipped > 90 days after
# order date; status 'F'. The Spark plan decorrelates both EXISTS
# into ONE per-order aggregate (distinct suppliers / distinct late
# suppliers) joined back — two shuffles total instead of two
# correlated self-joins; the oracle keeps the literal EXISTS form to
# prove equivalence.
# ---------------------------------------------------------------------------
@register(
    "q21_waiting_suppliers",
    """
    WITH lflag AS (
      SELECT l_orderkey, l_suppkey, o_orderstatus,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    )
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lflag l1 ON s_suppkey = l1.l_suppkey
    WHERE l1.o_orderstatus = 'F' AND l1.late = 1
      AND EXISTS (SELECT 1 FROM lflag l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lflag l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late = 1)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="TPC-H Q21: double correlated EXISTS decorrelated to one per-order agg",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    l, o, s = _t(spark, sf_dir, "lineitem", "orders", "supplier")
    lf = (
        l.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o.select("o_orderkey", "o_orderstatus", "o_orderdate"), F.col("o_orderkey") == F.col("l_orderkey"))
        .withColumn(
            "late",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).cast("int"),
        )
    )
    # Both EXISTS collapse into per-order distinct-supplier counts; a
    # window over l_orderkey computes them in the SAME shuffle that
    # already co-locates the order's lines (vs. groupBy + join-back =
    # the fact joined twice). collect_set is bounded by suppliers-per-
    # order (~single digits), so state per key stays tiny at 100 TB.
    w = Window.partitionBy("l_orderkey")
    cand = (
        lf.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(F.collect_set(F.when(F.col("late") == 1, F.col("l_suppkey"))).over(w)),
        )
        # >=2 suppliers in the order (EXISTS other), and every late line
        # belongs to this supplier (NOT EXISTS other late)
        .filter(
            (F.col("o_orderstatus") == "F")
            & (F.col("late") == 1)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late_supp") == 1)
        )
    )
    return (
        cand.join(F.broadcast(s.select("s_suppkey", "s_name")), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q22 — dormant high-balance customers. Adapted: the phone-prefix
# group becomes the nation key, and "dormant" = no order since
# 2000-01-01 (every fixture customer has SOME order). The balance
# threshold is a scalar subquery through the exact-decimal avg lane —
# a plain double avg would round differently per engine and flip
# membership at the threshold. Scale: 1-row broadcast threshold +
# anti join on the filtered orders side.
# ---------------------------------------------------------------------------
@register(
    "q22_dormant_balance",
    f"""
    SELECT c_nationkey, count(*) AS numcust, {SUMD('c_acctbal')} AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT {AVGD('c_acctbal')} FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="TPC-H Q22 shape: exact-decimal avg threshold + NOT EXISTS anti join",
)
def q22_dormant_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = _t(spark, sf_dir, "orders", "customer")
    threshold = c.filter(F.col("c_acctbal") > 0.0).agg(davg("c_acctbal").alias("__avg_bal"))
    recent = o.filter(F.col("o_orderdate") >= TS("2000-01-01")).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"), dsum("c_acctbal").alias("totacctbal"))
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier: the correlated-scalar-min shape, adapted
# (no partsupp in the fixture — lineitem is the part<->supplier bridge
# and unit cost derives from it as min(extendedprice/quantity), an
# IEEE-exact division so both engines agree bit-for-bit). The min is
# RESTRICTED to the region's suppliers before correlating, exactly as
# Q2 scopes ps_supplycost to the region. Scale: the decorrelated
# per-part min is one partial-agged shuffle of the bridge; region
# suppliers broadcast; the min join-back is an equi-join on
# (part, cost) — the classic argmin-by-joinback, never a per-part
# subquery execution.
# ---------------------------------------------------------------------------
@register(
    "q2_min_cost_supplier",
    """
    WITH asia_supp AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ), ps AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem JOIN asia_supp ON l_suppkey = s_suppkey
      GROUP BY l_partkey, l_suppkey
    ), mc AS (
      SELECT l_partkey AS mc_partkey, min(unit_cost) AS min_cost
      FROM ps GROUP BY l_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
    FROM ps
    JOIN mc ON mc_partkey = l_partkey AND unit_cost = min_cost
    JOIN asia_supp ON l_suppkey = s_suppkey
    JOIN part ON p_partkey = l_partkey
    WHERE p_size IN (5, 10)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape: region-scoped per-part min cost, argmin by join-back",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l, s, n, r, p = _t(spark, sf_dir, "lineitem", "supplier", "nation", "region", "part")
    asia_supp = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = (
        l.join(F.broadcast(asia_supp.select("s_suppkey")),
               F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    mc = ps.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    pf = p.filter(F.col("p_size").isin(5, 10)).select("p_partkey", "p_name")
    return (
        ps.join(
            mc,
            (F.col("mc_partkey") == F.col("l_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .join(F.broadcast(asia_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(pf), F.col("p_partkey") == F.col("l_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q11 — important stock: HAVING against a GLOBAL scalar subquery
# (group value > fraction of total value). Adapted: "value" is
# lineitem revenue from one nation's suppliers (no partsupp). Scale:
# per-part values are one partial-agged shuffle; the global total is a
# 1-row broadcast re-entering the HAVING as a plain filter — the
# scalar subquery decorrelation that keeps this a two-job plan at any
# size. Double parity: part values come from the exact-decimal lane,
# and total/threshold recompute from those exact doubles identically
# in both engines.
# ---------------------------------------------------------------------------
@register(
    "q11_important_parts",
    f"""
    WITH pv AS (
      SELECT l_partkey, {SUMD(_REV_SQL)} AS part_value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey, part_value
    FROM pv
    WHERE part_value > (
      SELECT CAST(CAST(sum(CAST(part_value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
             * 0.002
      FROM pv
    )
    ORDER BY part_value DESC, l_partkey
    """,
    doc="TPC-H Q11 shape: HAVING vs global scalar total, 1-row broadcast threshold",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l, s, n = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    nat_supp = (
        s.join(F.broadcast(n.filter(F.col("n_name") == "NATION_3")),
               F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    pv = (
        l.join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(dsum(_rev()).alias("part_value"))
    )
    total = pv.agg(
        (dsum(F.col("part_value")) * F.lit(0.002)).alias("__threshold")
    )
    return (
        pv.join(F.broadcast(total), F.col("part_value") > F.col("__threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


# ---------------------------------------------------------------------------
# Q20 — potential promotion suppliers: the nested-semi-join-with-
# correlated-threshold shape (supplier IN (... GROUP BY ... HAVING
# agg > correlated scalar)). Adapted: the threshold is the per-part
# cross-supplier average shipped quantity (no ps_availqty); suppliers
# shipping a promo part above its average qualify. Scale: the bridge
# agg and the per-part avg are partial-agged shuffles over the SAME
# grouping prefix (Catalyst reuses the exchange); qualification is an
# equi-join on part; the final supplier restriction is a semi join —
# no correlated execution anywhere. Quantity sums/avgs are
# integer-valued doubles, portable in any fold order.
# ---------------------------------------------------------------------------
@register(
    "q20_promo_suppliers",
    """
    WITH promo_parts AS (
      SELECT p_partkey FROM part WHERE p_type = 'PROMO'
    ), pairs AS (
      SELECT l_suppkey, l_partkey, sum(l_quantity) AS ship_qty
      FROM lineitem JOIN promo_parts ON p_partkey = l_partkey
      GROUP BY l_suppkey, l_partkey
    ), pa AS (
      SELECT l_partkey AS pa_partkey, avg(ship_qty) AS avg_qty
      FROM pairs GROUP BY l_partkey
    )
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM pairs JOIN pa ON pa_partkey = l_partkey
      WHERE ship_qty > avg_qty
    )
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q20 shape: nested semi joins + correlated per-part threshold",
)
def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l, p, s = _t(spark, sf_dir, "lineitem", "part", "supplier")
    promo = p.filter(F.col("p_type") == "PROMO").select("p_partkey")
    pairs = (
        l.join(F.broadcast(promo), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("ship_qty"))
    )
    pa = pairs.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        F.avg("ship_qty").alias("avg_qty")
    )
    qualified = (
        pairs.join(pa, F.col("pa_partkey") == F.col("l_partkey"))
        .filter(F.col("ship_qty") > F.col("avg_qty"))
        .select("l_suppkey")
    )
    return (
        s.join(qualified, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )
