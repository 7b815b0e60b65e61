"""Data-quality validation: declarative rule checks over a DataFrame.

The ETL feature the reference implies but never has: its schema layer
*declares* constraints (``nillable``/``unique``/FK ``relationship_name``,
``response.rs:65-85``; rendered as NOT NULL/UNIQUE/REFERENCES DDL,
``pg.rs:15-57``) yet nothing ever validates data against them. These
operators CHECK the declared constraints distributed-style and report
violation counts, instead of trusting the target database to reject
bad rows one at a time.

Scale notes:
- ``column_rules_report`` evaluates ALL row-level rules in one scan —
  a single aggregate of sum(CASE)s (map-side partial, one 1-row
  exchange), then a ``stack`` unpivot of that single row. N rules cost
  one pass, not N.
- ``uniqueness_violations`` is count - countDistinct (two partial
  aggregates, one exchange) — never a self-join.
- ``fk_orphan_count`` is the left-anti-join cardinality; the parent
  key side is aggregated to distinct keys first, so the build side is
  |keys|, not |parent rows|.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_rules_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row per rule: (rule, n_violations). Each rule's Column is a
    boolean predicate that is TRUE for a VIOLATING row. Null predicate
    results count as non-violations (SQL three-valued logic)."""
    if not rules:
        raise ValueError("at least one rule is required")
    aggs = [
        # coalesce: sum over an empty relation is NULL, and a report
        # must say "0 violations", not "unknown"
        F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias(name)
        for name, cond in rules.items()
    ]
    row = df.agg(*aggs)
    stacked = ", ".join(f"'{name}', `{name}`" for name in rules)
    return row.selectExpr(f"stack({len(rules)}, {stacked}) AS (rule, n_violations)")


def uniqueness_violations(df: DataFrame, cols: list[str], rule: str) -> DataFrame:
    """(rule, n_violations) where n = non-null-keyed rows - distinct
    key tuples. Rows with a NULL in any key column are excluded from
    the row count (SQL UNIQUE-constraint semantics: NULLs never
    conflict) — count_distinct already skips them, so counting them on
    the left would report every NULL-keyed row as a violation."""
    all_keys_set = reduce(lambda a, b: a & b, [F.col(c).isNotNull() for c in cols])
    keyed = F.count(F.when(all_keys_set, 1))
    return df.agg(
        (keyed - F.count_distinct(*[F.col(c) for c in cols]))
        .cast("bigint")
        .alias("n_violations")
    ).select(F.lit(rule).alias("rule"), "n_violations")


def fk_orphan_count(
    child: DataFrame, fk_col: str, parent: DataFrame, pk_col: str, rule: str
) -> DataFrame:
    """(rule, n_violations) where n = child rows whose FK value has no
    parent key (the anti-join FK validator from SURVEY §1.2; the
    reference only *declares* the FK, ``main.rs:89``).

    No broadcast hint on the parent side (r6 verdict task 3): the
    distinct parent-key set is O(|parent|), unbounded — a forced
    broadcast of a billion-row parent OOMs the driver. Unhinted, AQE
    still broadcasts when the measured build side is small, and a
    large parent correctly plans as a shuffled anti-join on the key."""
    keys = parent.select(F.col(pk_col).alias("__pk")).distinct()
    orphans = child.join(keys, child[fk_col] == F.col("__pk"), "left_anti")
    return orphans.agg(F.count(F.lit(1)).cast("bigint").alias("n_violations")).select(
        F.lit(rule).alias("rule"), "n_violations"
    )
