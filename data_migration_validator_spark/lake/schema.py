"""Column-id based table schema with widen-only evolution.

The reference only *detects* type drift via a per-warehouse regex
compatibility matrix (``conf/data_type_compatibility_matrix.csv``,
``validation_summary.py:427-506``).  Our engine *applies* evolution, so the
matrix is distilled into a widen-only lattice enforced in code (SURVEY.md §4
item 3): a column may only move to a type that can represent every value of
the old type.  Renames and adds are tracked by immutable field ids, so data
files written under any historical schema stay readable (the Iceberg idea,
re-implemented from scratch — no jars in this sandbox).
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field

from pyspark.sql import types as T

# widen-only lattice: frm -> set of allowed wider types (transitively closed).
_NUMERIC_ORDER = ["tinyint", "smallint", "int", "bigint", "double", "string"]
_WIDEN: dict[str, set[str]] = {}
for i, t in enumerate(_NUMERIC_ORDER):
    _WIDEN[t] = set(_NUMERIC_ORDER[i + 1 :])
_WIDEN["float"] = {"double", "string"}
_WIDEN["decimal"] = {"string"}
_WIDEN["date"] = {"timestamp", "string"}
_WIDEN["timestamp"] = {"string"}
_WIDEN["boolean"] = {"string"}
_WIDEN["char"] = {"varchar", "string"}
_WIDEN["varchar"] = {"string"}
_WIDEN["binary"] = set()
_WIDEN["string"] = set()


def _base(type_str: str) -> str:
    return type_str.split("(")[0].strip().lower()


def can_widen(frm: str, to: str) -> bool:
    """True iff ``frm -> to`` is a lossless widening."""
    f, t = _base(frm), _base(to)
    if f == t:
        return True
    return t in _WIDEN.get(f, set())


def parse_type(type_str: str) -> T.DataType:
    """Parse a DDL type string to a Spark DataType."""
    return T.StructType.fromDDL(f"__c {type_str}")[0].dataType


@dataclass
class Field:
    id: int
    name: str
    type: str  # Spark DDL type string

    def to_json(self) -> dict:
        return {"id": self.id, "name": self.name, "type": self.type}

    @staticmethod
    def from_json(d: dict) -> "Field":
        return Field(id=d["id"], name=d["name"], type=d["type"])


@dataclass
class TableSchema:
    fields: list[Field] = field(default_factory=list)
    last_field_id: int = 0

    # ---- construction -------------------------------------------------
    @staticmethod
    def from_pairs(pairs: list[tuple[str, str]]) -> "TableSchema":
        fields = [Field(i + 1, n, t) for i, (n, t) in enumerate(pairs)]
        return TableSchema(fields=fields, last_field_id=len(fields))

    @staticmethod
    def from_json(d: dict) -> "TableSchema":
        return TableSchema(
            fields=[Field.from_json(f) for f in d["fields"]],
            last_field_id=d["last_field_id"],
        )

    def to_json(self) -> dict:
        return {
            "fields": [f.to_json() for f in self.fields],
            "last_field_id": self.last_field_id,
        }

    # ---- lookups ------------------------------------------------------
    def names(self) -> list[str]:
        return [f.name for f in self.fields]

    def field_by_name(self, name: str) -> Field | None:
        for f in self.fields:
            if f.name == name:
                return f
        return None

    def field_by_id(self, fid: int) -> Field | None:
        for f in self.fields:
            if f.id == fid:
                return f
        return None

    def to_struct_type(self) -> T.StructType:
        return T.StructType(
            [T.StructField(f.name, parse_type(f.type), True) for f in self.fields]
        )

    # ---- evolution (each returns a NEW schema) -------------------------
    def add_column(self, name: str, type_str: str) -> "TableSchema":
        if self.field_by_name(name) is not None:
            raise ValueError(f"column {name!r} already exists")
        parse_type(type_str)  # validate
        s = copy.deepcopy(self)
        s.last_field_id += 1
        s.fields.append(Field(s.last_field_id, name, type_str))
        return s

    def rename_column(self, old: str, new: str) -> "TableSchema":
        if self.field_by_name(old) is None:
            raise ValueError(f"no column {old!r}")
        if self.field_by_name(new) is not None:
            raise ValueError(f"column {new!r} already exists")
        s = copy.deepcopy(self)
        s.field_by_name(old).name = new
        return s

    def widen_type(self, name: str, to: str) -> "TableSchema":
        f = self.field_by_name(name)
        if f is None:
            raise ValueError(f"no column {name!r}")
        if not can_widen(f.type, to):
            raise ValueError(
                f"illegal type change {f.type!r} -> {to!r} for column {name!r}: "
                "only widen-only transitions are allowed"
            )
        parse_type(to)
        s = copy.deepcopy(self)
        s.field_by_name(name).type = to
        return s
