"""Connector scan planning (S6/S7) and per-dialect metadata decode (S10)."""

import pytest

from data_migration_validator_spark.sources import (
    TERADATA_TYPE_CODES,
    decode_teradata_types,
    mssql_reader_options,
    mssql_schema_query,
    netezza_schema_query,
    normalize_metadata,
    snowflake_reader_options,
    snowflake_schema_query,
    teradata_schema_query,
)
from data_migration_validator_spark.validation.schema_check import (
    name_type_check,
    ordinal_check,
)


def test_snowflake_options_autopushdown_on():
    opts = snowflake_reader_options(
        "acct.snowflakecomputing.com", "u", "pk", "DB", "SCH", "WH", role="R"
    )
    assert opts["autopushdown"] == "on" and opts["sfRole"] == "R"
    assert snowflake_reader_options(
        "x", "u", "pk", "d", "s", "w", autopushdown=False
    )["autopushdown"] == "off"


def test_mssql_options_defaults():
    opts = mssql_reader_options("h", "db", "u", "p", "select 1")
    assert opts["port"] == "1433" and opts["fetchsize"] == "20000"
    assert opts["query"] == "select 1"


def test_schema_queries_shapes():
    q = teradata_schema_query("db1", "t1")
    assert "DBC.ColumnsV" in q and q.startswith("(") and q.endswith(") a")
    q = mssql_schema_query("dbo", "t1")
    assert "information_schema.columns" in q and "extended_properties" in q
    assert "_v_relation_column" in netezza_schema_query("t1")
    q = snowflake_schema_query("db", "sch", "t1")
    assert "information_schema.columns" in q and "'SCH'" in q and "'T1'" in q


def test_teradata_type_decode(spark):
    raw = spark.createDataFrame(
        [
            ("id", "I8 ", None, 8),
            ("name", "CV", 2, 200),   # UNICODE varchar: byte length halves
            ("note", "CV", 1, 50),    # LATIN varchar: length unchanged
            ("amt", "D", None, 16),
            ("weird", "ZZ", None, 4),  # unknown code -> null type
        ],
        "ColumnName string, ColumnType string, CharType int, ColumnLength int",
    )
    out = {r["ColumnName"]: r for r in decode_teradata_types(raw).collect()}
    assert out["id"]["data_type"] == "BIGINT"
    assert out["name"]["data_type"] == "VARCHAR" and out["name"]["column_length"] == 100
    assert out["note"]["column_length"] == 50
    assert out["amt"]["data_type"] == "DECIMAL"
    assert out["weird"]["data_type"] is None
    assert len(TERADATA_TYPE_CODES) == 43  # all reference branches present


def test_cross_dialect_metadata_feeds_schema_checks(spark):
    # Teradata catalog rows on one side, MSSQL information_schema rows on
    # the other → same store shape → existing ordinal/name-type joins work.
    td_raw = spark.createDataFrame(
        [("ID", "I8", None, 8, 1), ("NAME", "CV", 1, 50, 2), ("TD_ONLY", "DA", None, 4, 3)],
        "ColumnName string, ColumnType string, CharType int, ColumnLength int, ColumnOrder int",
    )
    td = normalize_metadata(decode_teradata_types(td_raw), "teradata", "src")
    ms = normalize_metadata(
        spark.createDataFrame(
            [("id", "bigint", 1), ("name", "varchar", 2), ("ms_only", "date", 3)],
            "COLUMN_NAME string, DATA_TYPE string, ORDINAL_POSITION int",
        ),
        "mssql",
        "tgt",
    )
    assert td.columns == ms.columns == ["col_name", "data_type", "col_order", "side", "comment"]

    nt = {r["col_key"]: r for r in name_type_check(td, ms).collect()}
    assert nt["id"]["datatype_compare"] == "MATCH"
    assert nt["td_only"]["col_name_compare"] == "MISMATCH"
    ords = {r["col_order"]: r for r in ordinal_check(td, ms).collect()}
    assert ords[3]["ordinal_compare"] == "MISMATCH"  # td_only vs ms_only
    assert ords[1]["ordinal_compare"] == "MATCH"


def test_normalize_rejects_unknown_dialect(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        normalize_metadata(df, "db2", "src")


def test_normalize_recovers_ordinal_from_desc_shaped_frame(spark):
    """W1: a dialect frame WITHOUT its ordinal column (bare DESC output,
    databricks-extract.py:86-117) gets a Spark-side row_number-over-
    monotonically_increasing_id ordinal in arrival order, and the ordinal
    join works against a catalog frame that does carry positions."""
    desc = spark.createDataFrame(
        [("id", "bigint"), ("name", "varchar"), ("amt", "double")],
        "COLUMN_NAME string, DATA_TYPE string",  # no ORDINAL_POSITION
    )
    src = normalize_metadata(desc, "mssql", "src")
    got = {r["col_name"]: r["col_order"] for r in src.collect()}
    assert got == {"id": 1, "name": 2, "amt": 3}
    assert src.columns == ["col_name", "data_type", "col_order", "side", "comment"]

    tgt = normalize_metadata(
        spark.createDataFrame(
            [("id", "bigint", 1), ("amt", "double", 2), ("name", "varchar", 3)],
            "COLUMN_NAME string, DATA_TYPE string, ORDINAL_POSITION int",
        ),
        "mssql",
        "tgt",
    )
    ords = {r["col_order"]: r["ordinal_compare"] for r in ordinal_check(src, tgt).collect()}
    assert ords[1] == "MATCH" and ords[2] == "MISMATCH" and ords[3] == "MISMATCH"
