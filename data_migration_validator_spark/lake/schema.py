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
# Integer widening stays within the integer chain; bigint -> double is NOT
# allowed (double's 53-bit mantissa cannot represent every bigint — values
# past 2^53 would round silently, the exact loss the gate exists to forbid).
# float -> double is exact; small integers fit float/double exactly
# (|values| < 2^24 / 2^53), int fits double but not float.
_INT_ORDER = ["tinyint", "smallint", "int", "bigint"]
_WIDEN: dict[str, set[str]] = {}
for i, t in enumerate(_INT_ORDER):
    _WIDEN[t] = set(_INT_ORDER[i + 1 :]) | {"string"}
_WIDEN["tinyint"] |= {"float", "double"}
_WIDEN["smallint"] |= {"float", "double"}
_WIDEN["int"] |= {"double"}
_WIDEN["float"] = {"double", "string"}
_WIDEN["double"] = {"string"}
_WIDEN["bigint"] |= set()  # NOT double: 2^53 rounding
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


def _params(type_str: str) -> tuple[int, ...] | None:
    """Parenthesized type parameters, e.g. decimal(38,10) -> (38, 10)."""
    s = type_str.strip()
    if "(" not in s:
        return None
    inner = s[s.index("(") + 1 : s.rindex(")")]
    try:
        return tuple(int(p.strip()) for p in inner.split(","))
    except ValueError:
        return None


def can_widen(frm: str, to: str) -> bool:
    """True iff ``frm -> to`` is a lossless widening.

    Same-base parameterized types compare their parameters — stripping them
    would wave decimal(38,10) -> decimal(5,2) (or varchar(100) ->
    varchar(10)) through a gate whose whole contract is "no value can be
    lost": decimal may only grow integral digits and scale
    (Iceberg's rule: precision-scale and scale both non-decreasing);
    char/varchar may only grow their length; an unparameterized target
    (plain ``string``/``decimal``) is the unbounded form and always fits.
    """
    f, t = _base(frm), _base(to)
    if f == t:
        pf, pt = _params(frm), _params(to)
        if pf is None or pt is None:
            # unparameterized source fits anything same-base; an
            # unparameterized target is the unbounded form
            return True
        if f == "decimal":
            (p1, s1), (p2, s2) = (tuple(pf) + (0,))[:2], (tuple(pt) + (0,))[:2]
            return (p2 - s2) >= (p1 - s1) and s2 >= s1
        # length-parameterized (char/varchar): length may only grow
        return pt[0] >= pf[0]
    ok = t in _WIDEN.get(f, set())
    if ok and f in ("char", "varchar") and t in ("char", "varchar"):
        # cross-base length types (char -> varchar): length still may not
        # shrink — char(10) -> varchar(2) would truncate
        pf, pt = _params(frm), _params(to)
        if pf is not None and pt is not None:
            return pt[0] >= pf[0]
    return ok


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
