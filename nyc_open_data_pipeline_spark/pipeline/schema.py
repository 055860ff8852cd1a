"""Declarative schema system: YAML/dict column specs -> Spark StructType.

Reimplements the reference's three-layer type system (SURVEY §1.2) in one:
config-declared logical types (free-form strings like "integer",
"VARCHAR(10)", "NUMERIC(12, 2)", "GEOMETRY('MULTIPOLYGON', srid=4326)" —
reference src/ingestion/storage.py:86-127) parse straight to Spark types.
Constraints (required/min/max/unique) become validation rules, not DDL —
Spark doesn't enforce them (SURVEY §1.3).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T


@dataclass
class ColumnSpec:
    name: str
    type: str = "string"
    required: bool = False
    primary_key: bool = False
    max_length: int | None = None
    min: float | None = None
    max: float | None = None

    @property
    def spark_type(self) -> T.DataType:
        return parse_type(self.type)


@dataclass
class TableSchema:
    table_name: str
    columns: list[ColumnSpec] = field(default_factory=list)
    unique_keys: list[str] = field(default_factory=list)
    partition_by: list[str] = field(default_factory=list)

    def to_struct_type(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(c.name, c.spark_type, nullable=not c.primary_key)
                for c in self.columns
            ]
        )

    @classmethod
    def from_dict(cls, d: dict) -> TableSchema:
        cols = [
            ColumnSpec(
                name=c["name"],
                type=str(c.get("type", "string")),
                required=bool(c.get("required", False)),
                primary_key=bool(c.get("primary_key", False)),
                max_length=c.get("max_length"),
                min=c.get("min"),
                max=c.get("max"),
            )
            for c in d.get("columns", [])
        ]
        validation = d.get("validation", {}) or {}
        return cls(
            table_name=d["table_name"],
            columns=cols,
            unique_keys=list(validation.get("unique_keys", [])),
            # reference "indexes" become partition/sort columns (SURVEY §4)
            partition_by=list(d.get("partition_by", d.get("indexes", []) or [])),
        )


_PARAM_RE = re.compile(r"^\s*([A-Za-z_ ]+?)\s*(?:\(([^)]*)\))?\s*$")

_SIMPLE = {
    "integer": T.IntegerType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "serial": T.LongType(),
    "string": T.StringType(),
    "text": T.StringType(),
    "varchar": T.StringType(),
    "char": T.StringType(),
    "float": T.DoubleType(),
    "double": T.DoubleType(),
    "real": T.FloatType(),
    "numeric": T.DoubleType(),  # bare NUMERIC without (p,s)
    "decimal": T.DoubleType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
    "geometry": T.StringType(),  # WKT at rest (SURVEY §1.1, §7.1)
}


def parse_type(type_str: str) -> T.DataType:
    """Parse a reference-style logical type string to a Spark DataType.

    NUMERIC(p,s) -> DecimalType(p,s); VARCHAR(n) -> StringType (length is a
    validation rule); GEOMETRY(...) -> StringType (WKT). Unknown -> String.
    """
    m = _PARAM_RE.match(type_str)
    if not m:
        return T.StringType()
    base = m.group(1).strip().lower()
    args = m.group(2)
    if base in ("numeric", "decimal") and args:
        parts = [p.strip() for p in args.split(",")]
        try:
            prec = int(parts[0])
            scale = int(parts[1]) if len(parts) > 1 else 0
            return T.DecimalType(prec, scale)
        except ValueError:
            return T.DoubleType()
    if base.startswith("array") and args:
        return T.ArrayType(parse_type(args))
    return _SIMPLE.get(base, T.StringType())
