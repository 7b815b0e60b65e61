"""Query registry: every operator from SURVEY.md §2 lands here as a
named (spark_fn, oracle_sql) pair, consumed by __spark_entry__.py.

`spark_fn(spark, sf_dir) -> DataFrame` is the engine-side plan;
`oracle_sql` is the ANSI-SQL equivalent DuckDB runs on the same
parquet files. `oracle_sql=None` marks genuinely non-SQL-expressible
ops (hash-seeded sketches, stateful streaming) — the driver then
records a rows-only check.

Column-name parity rule: every computed column is aliased identically
on both sides (the correctness gate sorts columns by name and hashes
values). Floating aggregates are rounded on both sides to absorb
summation-order differences between engines — see ROUND_* notes in
relational.py.

Output-type rule: registered queries return only scalar columns —
array/map results are serialized (``concat_ws`` / ``array_to_string``)
before the comparison boundary; the value-hash harness can't hash
nested numpy arrays and engines lay maps out differently.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One verifiable engine capability."""

    name: str
    fn: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a query to the global registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import all query modules and return the full registry."""
    # Imports are deferred so a syntax error in one module surfaces
    # at call time (driver-visible) instead of breaking package import.
    from sf_etl_spark.queries import (  # noqa: F401
        extensions,
        llm,
        multimodal,
        relational,
        similarity,
        soql_front,
        streaming_batch,
        streaming_live,
    )

    return dict(_REGISTRY)
