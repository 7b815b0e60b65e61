"""Source-type system: Salesforce field types → Spark ``DataType``.

Reference parity (SURVEY.md §1.2):
- the 28 source ``FieldType`` variants mirror
  ``oxidized-force/src/response.rs:98-143``;
- the mapping mirrors ``column_from_field``
  (``sql-builder/src/sql/../main.rs:84-101``) but targets Spark types
  instead of Postgres column types, with two deliberate improvements:

  1. ``Currency`` / ``Percent`` map to ``DecimalType(precision, scale)``
     derived from field metadata instead of degrading to varchar
     (the reference loses precision, ``main.rs:99``);
  2. ``Reference`` with a null ``relationship_name`` is tolerated
     (plain string key, no FK metadata) where the reference panics on
     ``unwrap()`` (``main.rs:89``).

Everything the relational layer can't type natively is carried in
``StructField.metadata`` so no information from ``describe`` is lost:
``length, custom, encrypted, precision, scale, updateable, unique,
relationship_name, primary_key, source_type, json``.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from enum import Enum
from typing import Any

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


class FieldType(str, Enum):
    """The 28 Salesforce field types (``response.rs:98-143``)."""

    ID = "id"
    BASE64 = "base64"
    BOOLEAN = "boolean"
    BYTE = "byte"
    DATE = "date"
    DOUBLE = "double"
    INT = "int"
    LONG = "long"
    STRING = "string"
    TIME = "time"
    ADDRESS = "address"
    ANY_TYPE = "anyType"
    CALCULATED = "calculated"
    CURRENCY = "currency"
    EMAIL = "email"
    JUNCTION_ID_LIST = "junctionIdList"
    LOCATION = "location"
    PERCENT = "percent"
    PHONE = "phone"
    PICKLIST = "picklist"
    REFERENCE = "reference"
    URL = "url"
    TEXT_AREA = "textarea"
    DATE_TIME = "datetime"
    COMBO_BOX = "combobox"
    ENCRYPTED_STRING = "encryptedstring"
    MASTER_RECORD = "masterrecord"
    MULTI_PICKLIST = "multipicklist"

    @classmethod
    def parse(cls, raw: str) -> "FieldType":
        try:
            return cls(raw)
        except ValueError:
            # Salesforce wire values are case-insensitive in practice
            low = raw.lower()
            for m in cls:
                if m.value.lower() == low:
                    return m
            raise ValueError(f"unknown Salesforce field type: {raw!r}") from None


@dataclass(frozen=True)
class Field:
    """One describe-response field (``response.rs:65-85``)."""

    name: str
    field_type: FieldType
    length: int = 0
    custom: bool = False
    encrypted: bool = False
    precision: int = 0
    scale: int = 0
    updateable: bool = True
    nillable: bool = True
    unique: bool = False
    relationship_name: str | None = None

    @classmethod
    def from_json(cls, obj: dict[str, Any]) -> "Field":
        """Accept both Salesforce wire casing (camelCase, ``type``)
        and the reference's struct casing (snake_case, ``field_type``)."""

        def pick(*keys, default=None):
            for k in keys:
                if k in obj and obj[k] is not None:
                    return obj[k]
            return default

        return cls(
            name=pick("name"),
            field_type=FieldType.parse(pick("field_type", "type")),
            length=int(pick("length", default=0)),
            custom=bool(pick("custom", default=False)),
            encrypted=bool(pick("encrypted", default=False)),
            precision=int(pick("precision", default=0)),
            scale=int(pick("scale", default=0)),
            updateable=bool(pick("updateable", default=True)),
            nillable=bool(pick("nillable", default=True)),
            unique=bool(pick("unique", default=False)),
            relationship_name=pick("relationship_name", "relationshipName"),
        )


# ---------------------------------------------------------------------------
# FieldType -> Spark DataType
# ---------------------------------------------------------------------------

# Fixed-type lanes (everything else falls through to the string lane).
_SIMPLE: dict[FieldType, DataType] = {
    FieldType.BOOLEAN: BooleanType(),
    FieldType.DATE: DateType(),
    FieldType.DATE_TIME: TimestampType(),
    FieldType.DOUBLE: DoubleType(),
    FieldType.INT: IntegerType(),
    FieldType.BYTE: IntegerType(),
    FieldType.LONG: LongType(),
}

# Types whose payload is JSON text (parsed on demand via from_json).
_JSON_TYPES = {FieldType.ANY_TYPE, FieldType.ADDRESS, FieldType.LOCATION}


def spark_type_for(f: Field) -> DataType:
    """Map one describe field to its Spark type (SURVEY §1.2 table)."""
    if f.field_type in _SIMPLE:
        return _SIMPLE[f.field_type]
    if f.field_type == FieldType.MULTI_PICKLIST:
        # wire value is ';'-joined -> split on ingest
        return ArrayType(StringType(), containsNull=False)
    if f.field_type in (FieldType.CURRENCY, FieldType.PERCENT):
        # Improvement over reference: keep exact decimal semantics.
        p = f.precision or 18
        s = f.scale if f.precision else 2
        return DecimalType(min(p, 38), min(s, min(p, 38)))
    # Id, Base64, String, Time, Calculated, Email, JunctionIdList,
    # Phone, Picklist, Reference, Url, TextArea, ComboBox,
    # EncryptedString, MasterRecord, AnyType/Address/Location (JSON)
    return StringType()


def struct_field_for(f: Field) -> StructField:
    """Field -> StructField with full metadata (lossless describe)."""
    md: dict[str, Any] = {"source_type": f.field_type.value}
    if f.length:
        md["length"] = f.length
    if f.custom:
        md["custom"] = True
    if f.encrypted or f.field_type == FieldType.ENCRYPTED_STRING:
        md["encrypted"] = True
    if f.precision:
        md["precision"] = f.precision
        md["scale"] = f.scale
    if not f.updateable:
        md["updateable"] = False
    if f.unique:
        md["unique"] = True
    if f.field_type == FieldType.ID:
        md["primary_key"] = True
    if f.field_type == FieldType.REFERENCE and f.relationship_name:
        # FK *declaration* only (reference: main.rs:89); integrity is
        # checked by anti-join (operators.joins.fk_orphan_counts).
        md["relationship_name"] = f.relationship_name
        md["foreign_key"] = {"table": f.relationship_name, "keys": ["Id"]}
    if f.field_type in _JSON_TYPES:
        md["json"] = True
    if f.field_type == FieldType.TIME:
        md["time_format"] = "HH:mm:ss.SSS"  # no Spark TimeType; convention
    if f.field_type == FieldType.BASE64:
        md["base64"] = True
    nullable = f.nillable and f.field_type != FieldType.ID
    return StructField(f.name, spark_type_for(f), nullable=nullable, metadata=md)


@dataclass(frozen=True)
class ObjectSchema:
    """A described object: name + ordered fields (``response.rs:58-63``).

    Ordered by construction — fixes the reference's nondeterministic
    HashMap column order (``table.rs:11``)."""

    name: str
    fields: tuple[Field, ...] = dc_field(default_factory=tuple)

    @classmethod
    def from_describe_json(cls, obj: dict[str, Any]) -> "ObjectSchema":
        return cls(
            name=obj["name"],
            fields=tuple(Field.from_json(f) for f in obj["fields"]),
        )

    def to_struct_type(self) -> StructType:
        return StructType([struct_field_for(f) for f in self.fields])

    def field_names(self) -> list[str]:
        """All-columns projection helper (``response.rs:147-153``)."""
        return [f.name for f in self.fields]
