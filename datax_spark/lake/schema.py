"""Table schema, type widening, and the column cast matrix.

Re-expresses DataX's Column type system (reference
``common/src/main/java/com/alibaba/datax/common/element/Column.java:74-76``:
{BAD, NULL, INT, LONG, DOUBLE, STRING, BOOL, DATE, BYTES}) as named,
field-id-tracked Spark types, and DataX's centralized ``ColumnCast``
(``common/.../element/ColumnCast.java:13-44``) as an explicit promotion
lattice used for schema evolution:

- widen: int→bigint, float→double, decimal(p,s)→decimal(p+,s) — the safe
  subset (Iceberg's evolution rules, applied because DataX's LongColumn is
  an unbounded BigInteger, ``common/.../element/LongColumn.java:20-39``).
- add column: new fields are nullable; old files read as NULL (DataX has no
  schema so "evolution" was implicit positional drift — we make it explicit).

Schemas are serialized to JSON inside the table metadata log; every field
carries a stable ``id`` so renames/drops could be supported later without
rewriting data (Iceberg-style name mapping).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import types as T

# Spark simpleString <-> type object for the scalar subset we persist.
_ATOMIC = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "smallint": T.ShortType(),
    "tinyint": T.ByteType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "timestamp_ntz": T.TimestampNTZType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
}

# widening lattice: src -> set of allowed destination typenames
_WIDEN = {
    "tinyint": {"smallint", "int", "bigint"},
    "smallint": {"int", "bigint"},
    "int": {"bigint"},
    "float": {"double"},
}


def type_from_string(s: str) -> T.DataType:
    s = s.strip().lower()
    if s in _ATOMIC:
        return _ATOMIC[s]
    m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", s)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    m = re.fullmatch(r"array<(.+)>", s)
    if m:
        return T.ArrayType(type_from_string(m.group(1)))
    raise ValueError(f"unsupported lake type: {s!r}")


def type_to_string(t: T.DataType) -> str:
    return t.simpleString()


def can_widen(src: str, dst: str) -> bool:
    """True if a column of type ``src`` may evolve to ``dst`` in place."""
    if src == dst:
        return True
    if dst in _WIDEN.get(src, ()):
        return True
    ms = re.fullmatch(r"decimal\((\d+),(\d+)\)", src.replace(" ", ""))
    md = re.fullmatch(r"decimal\((\d+),(\d+)\)", dst.replace(" ", ""))
    if ms and md:
        return int(md.group(2)) == int(ms.group(2)) and int(md.group(1)) >= int(ms.group(1))
    return False


def widen(src: str, dst: str) -> str:
    """Least common widened type of two observed types, or raise."""
    if can_widen(src, dst):
        return dst
    if can_widen(dst, src):
        return src
    raise ValueError(f"incompatible type evolution: {src} -> {dst}")


@dataclass
class Field:
    id: int
    name: str
    type: str  # spark simpleString
    nullable: bool = True

    def to_json(self) -> dict:
        return {"id": self.id, "name": self.name, "type": self.type, "nullable": self.nullable}

    @staticmethod
    def from_json(d: dict) -> "Field":
        return Field(d["id"], d["name"], d["type"], d.get("nullable", True))

    def spark_field(self) -> T.StructField:
        return T.StructField(self.name, type_from_string(self.type), self.nullable)


@dataclass
class TableSchema:
    schema_id: int
    fields: list[Field] = dc_field(default_factory=list)

    def to_json(self) -> dict:
        return {"schema_id": self.schema_id, "fields": [f.to_json() for f in self.fields]}

    @staticmethod
    def from_json(d: dict) -> "TableSchema":
        return TableSchema(d["schema_id"], [Field.from_json(f) for f in d["fields"]])

    @staticmethod
    def from_spark(st: T.StructType, schema_id: int = 0, first_field_id: int = 1) -> "TableSchema":
        fields = [
            Field(first_field_id + i, f.name, type_to_string(f.dataType), f.nullable)
            for i, f in enumerate(st.fields)
        ]
        return TableSchema(schema_id, fields)

    def spark_schema(self) -> T.StructType:
        return T.StructType([f.spark_field() for f in self.fields])

    def field_names(self) -> list[str]:
        return [f.name for f in self.fields]

    def by_name(self) -> dict[str, Field]:
        return {f.name: f for f in self.fields}

    def max_field_id(self) -> int:
        return max((f.id for f in self.fields), default=0)

    def evolve_to_union(self, incoming: T.StructType) -> tuple["TableSchema", list[str]]:
        """Union this schema with an incoming batch schema.

        Returns (possibly new TableSchema, list of human-readable changes).
        Raises on incompatible (non-widenable) type changes — those rows
        belong in quarantine, mirroring DataX's dirty-record conversion
        salvage (``CommonRdbmsReader.java:338-348``).
        """
        changes: list[str] = []
        current = {f.name: f for f in self.fields}
        new_fields = [Field(f.id, f.name, f.type, f.nullable) for f in self.fields]
        next_id = self.max_field_id() + 1
        for sf in incoming.fields:
            t = type_to_string(sf.dataType)
            if sf.name not in current:
                new_fields.append(Field(next_id, sf.name, t, True))
                changes.append(f"add column {sf.name} {t}")
                next_id += 1
            else:
                cur = current[sf.name]
                if cur.type != t:
                    widened = widen(cur.type, t)
                    if widened != cur.type:
                        for nf in new_fields:
                            if nf.name == cur.name:
                                nf.type = widened
                        changes.append(f"widen column {sf.name} {cur.type} -> {widened}")
        if not changes:
            return self, []
        return TableSchema(self.schema_id + 1, new_fields), changes
