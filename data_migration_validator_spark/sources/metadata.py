"""Per-dialect metadata capture (S10): remote schema-scan query plans and
the local decode that turns each dialect's raw catalog rows into the
engine's common schema-store shape ``(col_name, data_type, col_order,
side)`` consumed by the ordinal / name-type / compatibility checks
(``validation.schema_check``).

The remote halves are pushdown subquery strings (planning only — no
warehouse in the sandbox); the decode halves are Spark expressions over
whatever frame the scan returns, so they are fully unit-testable locally.

Reference parity:
- Teradata: ``integrations/teradata/teradata-extract.py:50-114`` — the
  40-branch ``ColumnType`` code decode + the CharType LATIN/UNICODE
  column-length halving, re-expressed as one map-literal lookup instead of
  a 40-WHEN CASE string.
- MSSQL: ``integrations/mssql/mssql-extract.py:59-80`` —
  information_schema.columns LEFT JOIN sys.extended_properties
  (MS_Description comments).
- Netezza: ``integrations/netezza/netezza-extract.py:50`` —
  ``_v_relation_column`` catalog view.
- Snowflake/Oracle/Hive: information-schema / ALL_TAB_COLUMNS / DESCRIBE
  per their extractors; same normalize step.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Teradata DBC.ColumnsV ColumnType codes → type names
# (teradata-extract.py:56-99 verbatim semantics).
TERADATA_TYPE_CODES: dict[str, str] = {
    "++": "TD_ANYTYPE",
    "A1": "ARRAY",
    "AN": "ARRAY",
    "AT": "TIME",
    "BF": "BYTE",
    "BO": "BLOB",
    "BV": "VARBYTE",
    "CF": "CHAR",
    "CO": "CLOB",
    "CV": "VARCHAR",
    "D": "DECIMAL",
    "DA": "DATE",
    "DH": "INTERVAL DAY TO HOUR",
    "DM": "INTERVAL DAY TO MINUTE",
    "DS": "INTERVAL DAY TO SECOND",
    "DT": "DATASET",
    "DY": "INTERVAL DAY",
    "F": "FLOAT",
    "HM": "INTERVAL HOUR TO MINUTE",
    "HR": "INTERVAL HOUR",
    "HS": "INTERVAL HOUR TO SECOND",
    "I1": "BYTEINT",
    "I2": "SMALLINT",
    "I8": "BIGINT",
    "I": "INTEGER",
    "JN": "JSON",
    "MI": "INTERVAL MINUTE",
    "MO": "INTERVAL MONTH",
    "MS": "INTERVAL MINUTE TO SECOND",
    "N": "NUMBER",
    "PD": "PERIOD(DATE)",
    "PM": "PERIOD(TIMESTAMP WITH TIME ZONE)",
    "PS": "PERIOD(TIMESTAMP)",
    "PT": "PERIOD(TIME)",
    "PZ": "PERIOD(TIME WITH TIME ZONE)",
    "SC": "INTERVAL SECOND",
    "SZ": "TIMESTAMP WITH TIME ZONE",
    "TS": "TIMESTAMP",
    "TZ": "TIME WITH TIME ZONE",
    "UT": "UDT",
    "XM": "XML",
    "YM": "INTERVAL YEAR TO MONTH",
    "YR": "INTERVAL YEAR",
}


def decode_teradata_types(
    df: DataFrame,
    type_col: str = "ColumnType",
    chartype_col: str = "CharType",
    length_col: str = "ColumnLength",
) -> DataFrame:
    """Decode raw DBC.ColumnsV rows: adds ``data_type`` (code → name via one
    map-literal lookup, null for unknown codes) and ``column_length``
    (UNICODE columns report byte length; halve it — the reference's
    CharType fix, teradata-extract.py:102-107)."""
    code_map = F.create_map(
        *chain.from_iterable(
            (F.lit(k), F.lit(v)) for k, v in TERADATA_TYPE_CODES.items()
        )
    )
    length = F.when(
        F.col(chartype_col) == 2, (F.col(length_col) / 2).cast("int")
    ).otherwise(F.col(length_col).cast("int"))
    return df.withColumns(
        {
            "data_type": F.element_at(code_map, F.trim(F.col(type_col))),
            "column_length": length,
        }
    )


_IDENT_RE = None


def _safe_ident(name: str) -> str:
    """Validate an identifier interpolated into a catalog-scan literal.

    These builders splice db/schema/table names into remote SQL strings; a
    quote in the value (legal in quoted identifiers, or attacker-supplied
    via the mapping CSV) would break out of the literal and push arbitrary
    predicates down to the warehouse.  Conservative allow-list — no quoting
    games, just reject."""
    global _IDENT_RE
    if _IDENT_RE is None:
        import re

        _IDENT_RE = re.compile(r"^[A-Za-z0-9_$#.]+$")
    if not _IDENT_RE.match(name or ""):
        raise ValueError(f"unsafe identifier for catalog query: {name!r}")
    return name


def teradata_schema_query(db_name: str, table_name: str) -> str:
    """Remote pushdown subquery over DBC.ColumnsV (teradata-extract.py:
    49-114) — ordinal via ROW_NUMBER over ColumnId; the type decode happens
    Spark-side in :func:`decode_teradata_types`."""
    return (
        "(SELECT DatabaseName, TableName, ColumnName, ColumnId, "
        "ROW_NUMBER() OVER (ORDER BY ColumnId) AS ColumnOrder, "
        "ColumnType, CharType, ColumnLength, DecimalTotalDigits, "
        "DecimalFractionalDigits, Nullable, CommentString "
        f"FROM DBC.ColumnsV WHERE DatabaseName = '{_safe_ident(db_name)}' "
        f"AND TableName = '{_safe_ident(table_name)}') a"
    )


def mssql_schema_query(db_name: str, table_name: str) -> str:
    """information_schema.columns + MS_Description extended properties
    (mssql-extract.py:59-80)."""
    return (
        "SELECT a.*, b.ColumnComment AS COLUMN_COMMENT "
        "FROM information_schema.columns a "
        "LEFT JOIN (SELECT SCHEMA_NAME(o.schema_id) AS Schema_Name, "
        "o.name AS Table_Name, c.name AS ColumnName, "
        "CONVERT(VARCHAR(MAX), ep.value) AS ColumnComment "
        "FROM sys.columns c "
        "LEFT JOIN sys.objects o ON c.object_id = o.object_id "
        "LEFT JOIN sys.extended_properties ep "
        "ON ep.major_id = c.object_id AND ep.minor_id = c.column_id "
        "WHERE LOWER(ep.name) = 'ms_description') b "
        # schema-qualified: a same-named table in another schema would
        # otherwise fan the LEFT JOIN out and duplicate catalog rows
        "ON a.TABLE_SCHEMA = b.Schema_Name "
        "AND a.TABLE_NAME = b.Table_Name AND a.COLUMN_NAME = b.ColumnName "
        f"WHERE a.table_schema = '{_safe_ident(db_name)}' "
        f"AND a.table_name = '{_safe_ident(table_name)}'"
    )


def netezza_schema_query(table_name: str) -> str:
    """``_v_relation_column`` catalog scan (netezza-extract.py:50)."""
    return (
        "(SELECT * FROM _v_relation_column "
        f"WHERE name = '{_safe_ident(table_name)}') a"
    )


def snowflake_schema_query(database: str, schema: str, table_name: str) -> str:
    """information_schema.columns scan (snowflake-extract.py:53-75 shape)."""
    return (
        "SELECT column_name, data_type, ordinal_position, is_nullable, comment "
        f"FROM {_safe_ident(database)}.information_schema.columns "
        f"WHERE table_schema = '{_safe_ident(schema).upper()}' "
        f"AND table_name = '{_safe_ident(table_name).upper()}' "
        "ORDER BY ordinal_position"
    )


# column-name mapping from each dialect's catalog rows to the common store
_DIALECT_COLS: dict[str, tuple[str, str, str]] = {
    # dialect: (name col, decoded type col, ordinal col)
    "teradata": ("ColumnName", "data_type", "ColumnOrder"),
    "mssql": ("COLUMN_NAME", "DATA_TYPE", "ORDINAL_POSITION"),
    "snowflake": ("COLUMN_NAME", "DATA_TYPE", "ORDINAL_POSITION"),
    "netezza": ("attname", "format_type", "attnum"),
    "oracle": ("COLUMN_NAME", "DATA_TYPE", "COLUMN_ID"),
    "hive": ("col_name", "data_type", "col_order"),
    "spark": ("col_name", "data_type", "col_order"),
}

# per-dialect COLUMN COMMENT source (SUM:361, 381-391: COL_COMMENT is
# captured by every warehouse's catalog query and compared null-safely into
# comment_compare_status).  ``None`` = the dialect exposes comments only via
# a separate catalog table (Oracle ALL_COL_COMMENTS) — the store column is
# NULL and the compare degrades to presence parity.
_DIALECT_COMMENT_COLS: dict[str, str | None] = {
    "teradata": "CommentString",   # DBC.ColumnsV (teradata-extract.py:60)
    "mssql": "COLUMN_COMMENT",     # MS_Description ext-props join above
    "snowflake": "COMMENT",        # information_schema.columns.comment
    "netezza": "description",      # _v_relation_column
    "oracle": "COMMENTS",        # all_tab_columns ⟕ USER_COL_COMMENTS
                                   # (oracle-extract.py:51-52 exposes COMMENTS)
    "hive": "comment",
    "spark": "comment",
}


def normalize_metadata(df: DataFrame, dialect: str, side: str) -> DataFrame:
    """Project a dialect's raw catalog rows to the engine's schema-store
    shape ``(col_name, data_type, col_order, side)`` so any warehouse's
    metadata feeds the same ordinal/name/type/compatibility joins.
    Teradata frames must pass through :func:`decode_teradata_types` first
    (it supplies the decoded ``data_type``).

    When the dialect frame has no ordinal column (a bare DESC-output shape:
    the reference captures it with row_number over
    monotonically_increasing_id, databricks-extract.py:86-117), the ordinal
    is recovered Spark-side the same way — from the frame's arrival order.
    Schema frames are a few hundred rows, so the single-partition window is
    the right altitude (coalesce(1) makes the global order explicit rather
    than relying on partition count)."""
    if dialect not in _DIALECT_COLS:
        raise ValueError(f"unknown dialect {dialect!r}")
    name_c, type_c, ord_c = _DIALECT_COLS[dialect]
    if ord_c in df.columns:
        order = F.col(ord_c).cast("int")
    else:
        w = Window.orderBy("__mono")
        df = (
            df.coalesce(1)
            .withColumn("__mono", F.monotonically_increasing_id())
            .withColumn("__ord", F.row_number().over(w))
        )
        order = F.col("__ord").cast("int")
    comment_c = _DIALECT_COMMENT_COLS.get(dialect)
    # match case-insensitively: JDBC drivers differ in identifier casing
    by_lower = {c.lower(): c for c in df.columns}
    actual = by_lower.get(comment_c.lower()) if comment_c else None
    comment = (
        F.col(actual).cast("string")
        if actual is not None
        else F.lit(None).cast("string")
    )
    return df.select(
        F.lower(F.col(name_c)).alias("col_name"),
        F.lower(F.col(type_c)).alias("data_type"),
        order.alias("col_order"),
        F.lit(side).alias("side"),
        comment.alias("comment"),
    )
