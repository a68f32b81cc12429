"""Round-5 hardening: oracle comment-column mapping, legacy summary
conjunction, col_mapping collision guard, {full_outer_table} temp-view
hygiene, and demux multi-failure reporting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_migration_validator_spark.sources.metadata import normalize_metadata
from data_migration_validator_spark.validation import (
    AddtnlFilter,
    TableMapping,
    run_mappings,
    run_validation,
)
from data_migration_validator_spark.validation.report import summary_conjunction


def test_oracle_metadata_carries_comments(spark):
    """The reference's oracle extract (oracle-extract.py:51-52) joins
    USER_COL_COMMENTS and exposes COMMENTS — the normalized frame must
    carry it, or every commented target column would NULL<=>non-NULL
    mismatch against an oracle source."""
    raw = spark.createDataFrame(
        [("ID", "NUMBER", 1, "primary key"), ("V", "VARCHAR2", 2, None)],
        "COLUMN_NAME string, DATA_TYPE string, COLUMN_ID int, COMMENTS string",
    )
    got = {
        r["col_name"]: r["comment"]
        for r in normalize_metadata(raw, "oracle", "src").collect()
    }
    assert got == {"id": "primary key", "v": None}


def test_oracle_metadata_without_comments_column(spark):
    """An older capture lacking COMMENTS still normalizes (NULL comment)."""
    raw = spark.createDataFrame(
        [("ID", "NUMBER", 1)],
        "COLUMN_NAME string, DATA_TYPE string, COLUMN_ID int",
    )
    rows = normalize_metadata(raw, "oracle", "src").collect()
    assert rows[0]["comment"] is None


def test_summary_conjunction_legacy_store(spark):
    """Summary rows persisted before the after-exclusion/comment checks
    existed must not retroactively flip to FAILED: the missing columns fold
    through their legacy fallback (data_mismatch_status) or skip the gate
    (comment compare, which never ran)."""
    legacy_cols = (
        "run_id string, table_family string, src_table string, "
        "tgt_table string, row_count_status string, "
        "data_mismatch_status string, hash_match_status string, "
        "extras_status string, primary_key_compliance_status string, "
        "column_names_status string, ordinal_status string, "
        "datatype_compatibility_status string, matches long, "
        "mismatches long, src_extras long, tgt_extras long, "
        "started_at double, finished_at double"
    )
    ok = (
        "r1", "fam", "s", "t", "SUCCESS", "SUCCESS", "SUCCESS", "SUCCESS",
        "SUCCESS", "SUCCESS", "SUCCESS", "SUCCESS", 10, 0, 0, 0, 0.0, 1.0,
    )
    bad = (
        "r1", "fam2", "s", "t", "SUCCESS", "FAILED", "FAILED", "SUCCESS",
        "SUCCESS", "SUCCESS", "SUCCESS", "SUCCESS", 9, 1, 0, 0, 0.0, 1.0,
    )
    legacy = spark.createDataFrame([ok, bad], legacy_cols)
    out = {r["table_family"]: r for r in summary_conjunction(legacy).collect()}
    # all-green legacy run stays SUCCESS (no NULL-is-FAILED on never-written
    # columns), and the mismatch gate still works through the fallback
    assert out["fam"]["final_validation_status"] == "SUCCESS"
    assert out["fam2"]["final_validation_status"] == "FAILED"
    # output schema is stable: the modern columns surface as NULL
    assert out["fam"]["mismatches_after_exclusion_status"] is None
    assert out["fam"]["comment_compare_status"] is None


def test_col_mapping_collision_fails_loud(spark, tmp_root):
    """A mapped target name colliding with another (unmapped) source column
    would silently duplicate the column; it must fail loudly instead —
    run_mappings records the config error, it does not produce ambiguous
    results."""
    import os

    from data_migration_validator_spark.validation.store import (
        make_log_table,
        make_summary_table,
    )

    src = spark.createDataFrame([(1, 2)], "ID_NBR long, id long")
    tgt = spark.createDataFrame([(1,)], "id long")
    frames = {"s": src, "t": tgt}
    m = TableMapping("fam", "s", "t", ["id"], col_mapping={"ID_NBR": "id"})
    summary_t = make_summary_table(spark, os.path.join(tmp_root, "sum"))
    log_t = make_log_table(spark, os.path.join(tmp_root, "log"))
    res = run_mappings(
        spark, [m], resolve=lambda n: frames[n], run_id="r1",
        summary_table=summary_t, log_table=log_t,
    )
    assert "fam" not in res  # no ambiguous result frames escape
    srow = summary_t.read().collect()[0]
    assert srow["validation_status"] == "FAILED"
    err = log_t.read().filter("stage = 'error'").collect()[0]["message"]
    assert "duplicate column name" in err and "id" in err


def test_full_outer_placeholder_views_dropped(spark):
    """{full_outer_table} temp views must not leak across run_validation
    calls — and dropping them must not break the already-constructed report
    frames (analysis is eager; collect AFTER the drop still works)."""
    src = spark.range(1, 41).select(
        "id", (F.col("id") * 2.0).alias("price")
    )
    tgt = src.withColumn(
        "price",
        F.when(F.col("id") % 5 == 0, F.col("price") + 1).otherwise(
            F.col("price")
        ),
    )
    before = {
        v.name for v in spark.catalog.listTables() if v.isTemporary
    }
    filters = [
        AddtnlFilter(
            "low_half", "id <= (select max(id) from {full_outer_table}) / 2"
        )
    ]
    reports = run_validation(src, tgt, key_cols=["id"], addtnl_filters=filters)
    after = {
        v.name for v in spark.catalog.listTables() if v.isTemporary
    }
    assert not {
        n for n in after - before if n.startswith("__full_outer_")
    }, "leaked {full_outer_table} temp views"
    # dropped view must not break execution of the returned frames
    got = {
        r["column_name"]: r
        for r in reports["addtnl_filter_metrics"].collect()
    }
    reports["annotated"].unpersist()
    assert got["price"]["total_overlaps"] == 20
    assert got["price"]["mismatches"] == 4  # ids 5, 10, 15, 20
