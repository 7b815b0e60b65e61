"""Sink-side DDL generation: ``StructType`` → ``CREATE TABLE`` text.

Reference parity (SURVEY.md §2.1 R9): mirrors the
``SqlGenerator`` trait + ``Pg`` generator
(``sql-builder/src/sql/mod.rs:9-12``, ``generators/pg.rs:8-85``) and
``Table::generate`` (``table.rs:33-53``), with deliberate fixes:

- deterministic column order (StructType is ordered; the reference's
  ``HashMap`` makes DDL order nondeterministic, ``table.rs:11``);
- numeric/boolean DEFAULT values are rendered unquoted (the reference
  single-quotes everything, ``pg.rs:45``);
- a second dialect (Spark SQL) proves the interface generalizes.

Column modifiers honored: PRIMARY KEY, NOT NULL, UNIQUE, DEFAULT,
REFERENCES (FK declaration from field metadata).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructType,
    TimestampNTZType,
    TimestampType,
)


def _quote_ident(name: str, q: str = '"') -> str:
    return f"{q}{name.replace(q, q * 2)}{q}"


def _render_default(value: Any) -> str:
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return str(value)
    return "'" + str(value).replace("'", "''") + "'"


class SqlDialect:
    """Dialect interface (mirrors the ``SqlGenerator`` trait,
    ``sql-builder/src/sql/mod.rs:9-12``): subclasses override type
    rendering; statement assembly is shared."""

    name = "ansi"
    quote = '"'

    def render_type(self, dt: DataType, metadata: dict[str, Any]) -> str:
        if isinstance(dt, StringType):
            if metadata.get("json"):
                return self.json_type()
            length = metadata.get("length")
            return f"VARCHAR({length})" if length else self.text_type()
        if isinstance(dt, BooleanType):
            return "BOOLEAN"
        if isinstance(dt, (ByteType, ShortType, IntegerType)):
            return "INTEGER"
        if isinstance(dt, LongType):
            return "BIGINT"
        if isinstance(dt, FloatType):
            return "REAL"
        if isinstance(dt, DoubleType):
            return self.double_type()
        if isinstance(dt, DecimalType):
            return f"NUMERIC({dt.precision}, {dt.scale})"
        if isinstance(dt, DateType):
            return "DATE"
        if isinstance(dt, (TimestampType, TimestampNTZType)):
            return "TIMESTAMP"
        if isinstance(dt, ArrayType):
            return self.array_type(dt, metadata)
        if isinstance(dt, (MapType, StructType)):
            return self.json_type()
        raise TypeError(f"{self.name}: unsupported DDL type {dt!r}")

    def text_type(self) -> str:
        return "TEXT"

    def double_type(self) -> str:
        return "DOUBLE PRECISION"

    def json_type(self) -> str:
        return "TEXT"

    def array_type(self, dt: ArrayType, metadata: dict[str, Any]) -> str:
        inner = self.render_type(dt.elementType, {})
        return f"{inner}[]"

    # -- statement assembly (shared; ``Table::generate`` analog) ----------

    def create_column(self, field) -> str:
        md = dict(field.metadata or {})
        parts = [
            _quote_ident(field.name, self.quote),
            self.render_type(field.dataType, md),
        ]
        if md.get("primary_key"):
            parts.append("PRIMARY KEY")
        if "default" in md:
            parts.append(f"DEFAULT {_render_default(md['default'])}")
        if not field.nullable and not md.get("primary_key"):
            parts.append("NOT NULL")
        if md.get("unique"):
            parts.append("UNIQUE")
        fk = md.get("foreign_key")
        if fk:
            keys = ", ".join(_quote_ident(k, self.quote) for k in fk["keys"])
            parts.append(f"REFERENCES {_quote_ident(fk['table'], self.quote)} ({keys})")
        return " ".join(parts)

    def create_table(self, name: str, schema: StructType, if_not_exists: bool = False) -> str:
        cols = ",\n  ".join(self.create_column(f) for f in schema.fields)
        ine = "IF NOT EXISTS " if if_not_exists else ""
        return f"CREATE TABLE {ine}{_quote_ident(name, self.quote)} (\n  {cols}\n);"


class PgDialect(SqlDialect):
    """PostgreSQL (the reference's one generator, ``pg.rs:8-85``)."""

    name = "postgres"

    def json_type(self) -> str:
        return "JSONB"


class SparkDialect(SqlDialect):
    """Spark SQL DDL — shows the dialect interface generalizes; FK /
    UNIQUE are informational-only in Spark, so they are omitted."""

    name = "spark"
    quote = "`"

    def render_type(self, dt: DataType, metadata: dict[str, Any]) -> str:
        if isinstance(dt, (ArrayType, MapType, StructType)):
            return dt.simpleString().upper()
        if isinstance(dt, StringType):
            return "STRING"
        if isinstance(dt, DoubleType):
            return "DOUBLE"
        if isinstance(dt, (TimestampType,)):
            return "TIMESTAMP"
        return super().render_type(dt, metadata)

    def create_column(self, field) -> str:
        parts = [_quote_ident(field.name, self.quote), self.render_type(field.dataType, dict(field.metadata or {}))]
        if not field.nullable:
            parts.append("NOT NULL")
        return " ".join(parts)

    def create_table(self, name: str, schema: StructType, if_not_exists: bool = False) -> str:
        cols = ",\n  ".join(self.create_column(f) for f in schema.fields)
        ine = "IF NOT EXISTS " if if_not_exists else ""
        return f"CREATE TABLE {ine}{_quote_ident(name, self.quote)} (\n  {cols}\n) USING parquet;"


DIALECTS: dict[str, SqlDialect] = {
    d.name: d for d in (SqlDialect(), PgDialect(), SparkDialect())
}


def create_table_ddl(name: str, schema: StructType, dialect: str = "postgres") -> str:
    """``Table::generate::<Pg>()`` analog: one CREATE TABLE statement,
    deterministic column order = StructType order."""
    return DIALECTS[dialect].create_table(name, schema)
