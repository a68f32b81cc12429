"""Reference validation_mapping config-surface parity (README.md:191-236):
col_mapping renames, mismatch_exclude_fields + mismatches_after_exclusion
status, addtnl_filters slices, and per-column comment compare
(validation_summary.py:361,381-391)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_migration_validator_spark.validation import (
    AddtnlFilter,
    TableMapping,
    load_mappings_csv,
    run_mappings,
    run_validation,
)
from data_migration_validator_spark.validation.schema_check import (
    name_type_check,
    schema_store,
)


def _pair(spark, n=100, bad_price=(7,), bad_flag=(11,)):
    """src/tgt frames with injected mismatches: price differs on ids
    divisible by any of bad_price, flag differs on bad_flag multiples."""
    src = spark.range(1, n + 1).select(
        F.col("id"),
        (F.col("id") * 10.0).alias("price"),
        F.concat(F.lit("f"), (F.col("id") % 3).cast("string")).alias("flag"),
    )
    price = F.col("price")
    for m in bad_price:
        price = F.when(F.col("id") % m == 0, F.col("price") + 1).otherwise(price)
    flag = F.col("flag")
    for m in bad_flag:
        flag = F.when(F.col("id") % m == 0, F.lit("XX")).otherwise(flag)
    tgt = src.withColumn("price", price).withColumn("flag", flag)
    return src, tgt


def test_col_mapping_renames_src(spark):
    src, tgt = _pair(spark, 50, bad_price=(), bad_flag=())
    # source arrives under legacy names; mapping renames to target naming
    legacy = src.select(
        F.col("id").alias("ID_NBR"),
        F.col("price").alias("PRC_AMT"),
        F.col("flag").alias("FLG_CD"),
    )
    frames = {"s": legacy, "t": tgt}
    m = TableMapping(
        "fam", "s", "t", ["id"],
        col_mapping={"ID_NBR": "id", "PRC_AMT": "price", "FLG_CD": "flag"},
    )
    res = run_mappings(spark, [m], resolve=lambda n: frames[n], run_id="r1")
    summary = res["fam"]["summary"]
    assert summary["validation_status"] == "SUCCESS"
    assert summary["matches"] == 50


def test_mismatch_exclusion_status(spark):
    src, tgt = _pair(spark, 100, bad_price=(7,), bad_flag=())
    # price mismatches exist; excluding price must rescue the run
    reports = run_validation(
        src, tgt, key_cols=["id"], mismatch_exclude_fields=["price"]
    )
    s = reports["summary"]
    reports["annotated"].unpersist()
    assert s["data_mismatch_status"] == "FAILED"
    assert s["mismatches_after_exclusion_status"] == "SUCCESS"
    assert s["validation_status"] == "SUCCESS"

    # a mismatch OUTSIDE the exclusion list still fails
    src2, tgt2 = _pair(spark, 100, bad_price=(7,), bad_flag=(11,))
    reports2 = run_validation(
        src2, tgt2, key_cols=["id"], mismatch_exclude_fields=["price"]
    )
    s2 = reports2["summary"]
    reports2["annotated"].unpersist()
    assert s2["mismatches_after_exclusion_status"] == "FAILED"
    assert s2["validation_status"] == "FAILED"

    # without exclusions the raw and after-exclusion statuses coincide
    reports3 = run_validation(src, tgt, key_cols=["id"])
    s3 = reports3["summary"]
    reports3["annotated"].unpersist()
    assert s3["mismatches_after_exclusion_status"] == s3["data_mismatch_status"]
    assert s3["validation_status"] == "FAILED"


def test_addtnl_filter_slices(spark):
    src, tgt = _pair(spark, 100, bad_price=(10,), bad_flag=())
    filters = [
        AddtnlFilter("N/A", "N/A"),
        AddtnlFilter("low_ids", "id <= 50"),
        AddtnlFilter("high_ids", "id > 50", capture_mismatches=True),
    ]
    reports = run_validation(
        src, tgt, key_cols=["id"], addtnl_filters=filters
    )
    metrics = {
        (r["addtnl_filter"], r["column_name"]): r
        for r in reports["addtnl_filter_metrics"].collect()
    }
    # N/A slice = all 100 overlaps; price mismatches on multiples of 10
    assert metrics[("N/A", "price")]["total_overlaps"] == 100
    assert metrics[("N/A", "price")]["mismatches"] == 10
    assert metrics[("N/A", "flag")]["mismatches"] == 0
    # low slice: ids 10..50 → 5 price mismatches over 50 overlaps
    assert metrics[("low_ids", "price")]["total_overlaps"] == 50
    assert metrics[("low_ids", "price")]["mismatches"] == 5
    assert metrics[("high_ids", "price")]["mismatches"] == 5
    # capture_mismatches → row-level capture for the flagged slice only
    caps = reports["addtnl_mismatch_rows"]
    assert set(caps) == {"high_ids"}
    rows = caps["high_ids"].collect()
    # 5 mismatched keys × 2 sides
    assert len(rows) == 10
    assert all(r["id"] > 50 for r in rows)
    reports["annotated"].unpersist()


def test_addtnl_filter_full_outer_placeholder(spark):
    """The reference's {full_outer_table} scalar-subquery form
    (README.md:222-224) resolves against the annotated frame itself."""
    src, tgt = _pair(spark, 60, bad_price=(9,), bad_flag=())
    filters = [
        AddtnlFilter(
            "below_max_half",
            "id <= (select max(id) from {full_outer_table}) / 2",
        ),
    ]
    reports = run_validation(src, tgt, key_cols=["id"], addtnl_filters=filters)
    got = {
        r["column_name"]: r
        for r in reports["addtnl_filter_metrics"].collect()
    }
    reports["annotated"].unpersist()
    assert got["price"]["total_overlaps"] == 30  # ids 1..30
    assert got["price"]["mismatches"] == 3  # 9, 18, 27


def test_addtnl_filters_reject_short_circuit(spark):
    src, tgt = _pair(spark, 10)
    with pytest.raises(ValueError, match="bucket_short_circuit"):
        run_validation(
            src, tgt, key_cols=["id"],
            addtnl_filters=[AddtnlFilter("N/A", "N/A")],
            bucket_short_circuit=8,
        )


def _schema_with_comments(names_types_comments):
    return T.StructType(
        [
            T.StructField(
                n, T._parse_datatype_string(t),
                metadata={"comment": c} if c is not None else {},
            )
            for n, t, c in names_types_comments
        ]
    )


def test_comment_compare(spark):
    src_schema = _schema_with_comments(
        [("id", "bigint", "primary key"), ("v", "string", "the value")]
    )
    tgt_same = _schema_with_comments(
        [("id", "bigint", "Primary Key"), ("v", "string", "the value")]
    )
    tgt_diff = _schema_with_comments(
        [("id", "bigint", "primary key"), ("v", "string", "renamed doc")]
    )
    s = schema_store(spark, src_schema, "src")
    # lowered null-safe compare: case-only difference is a MATCH
    nt_ok = name_type_check(s, schema_store(spark, tgt_same, "tgt"))
    assert {r["comment_compare"] for r in nt_ok.collect()} == {"MATCH"}
    nt_bad = name_type_check(s, schema_store(spark, tgt_diff, "tgt"))
    got = {r["col_key"]: r["comment_compare"] for r in nt_bad.collect()}
    assert got == {"id": "MATCH", "v": "MISMATCH"}


def test_comment_status_in_summary(spark):
    """A comment-only divergence must surface as comment_compare_status
    FAILED in the pipeline summary while every data check passes."""
    src_schema = _schema_with_comments([("id", "bigint", "key")])
    src = spark.createDataFrame([(1,), (2,)], src_schema)
    tgt = spark.createDataFrame(
        [(1,), (2,)], _schema_with_comments([("id", "bigint", "KEY changed")])
    )
    reports = run_validation(
        src.withColumn("v", F.lit("a")),
        tgt.withColumn("v", F.lit("a")),
        key_cols=["id"],
    )
    s = reports["summary"]
    reports["annotated"].unpersist()
    assert s["comment_compare_status"] == "FAILED"
    assert s["data_mismatch_status"] == "SUCCESS"
    assert s["validation_status"] == "FAILED"


def test_load_mappings_csv_json_columns(spark, tmp_path):
    af = json.dumps(
        [
            {"filter_name": "N/A", "filter": "N/A", "capture_mismatches": False},
            {"filter_name": "us", "filter": "loc_tgt = 'US'",
             "capture_mismatches": True},
        ]
    )
    cm = json.dumps({"SRC_ID": "id"})
    line = (
        "fam1,s,t,id,,,,false,true,"
        + '"' + cm.replace('"', '""') + '",'
        + "aud_ts|load_ts,"
        + '"' + af.replace('"', '""') + '"'
    )
    p = tmp_path / "m.csv"
    p.write_text(
        "table_family,src_table,tgt_table,key_cols,compare_cols,filter,"
        "date_col,quick_validation,is_active,col_mapping,"
        "mismatch_exclude_fields,addtnl_filters\n" + line + "\n"
    )
    (m,) = load_mappings_csv(spark, str(p))
    assert m.col_mapping == {"SRC_ID": "id"}
    assert m.mismatch_exclude_fields == ["aud_ts", "load_ts"]
    assert [f.filter_name for f in m.addtnl_filters] == ["N/A", "us"]
    assert m.addtnl_filters[1].capture_mismatches is True
    assert m.addtnl_filters[1].filter == "loc_tgt = 'US'"


def test_persist_addtnl_metrics_slices(spark, tmp_path):
    """Slice metrics persist into the mismatch-metrics table under their
    filter names, base rows under 'N/A' (reference MISMATCH_METRICS shape);
    the top-mismatched report ranks base rows only."""
    from data_migration_validator_spark.validation import (
        make_column_metrics_table,
        run_mappings,
    )
    from data_migration_validator_spark.validation.report import (
        top_mismatched_columns,
    )

    src, tgt = _pair(spark, 100, bad_price=(10,), bad_flag=())
    frames = {"s": src, "t": tgt}
    m = TableMapping(
        "fam", "s", "t", ["id"],
        addtnl_filters=[
            AddtnlFilter("N/A", "N/A"),
            AddtnlFilter("low", "id <= 50"),
        ],
    )
    mt = make_column_metrics_table(spark, str(tmp_path / "metrics"))
    run_mappings(
        spark, [m], resolve=lambda n: frames[n], run_id="r1",
        column_metrics_table=mt,
    )
    stored = {
        (r["addtnl_filter"], r["column_name"]): r for r in mt.read().collect()
    }
    assert stored[("N/A", "price")]["mismatches"] == 10
    assert stored[("low", "price")]["mismatches"] == 5
    assert stored[("low", "price")]["total_overlaps"] == 50
    # rerun-safe (slice cleared, no duplicates)
    run_mappings(
        spark, [m], resolve=lambda n: frames[n], run_id="r1",
        column_metrics_table=mt,
    )
    assert mt.read().count() == len(stored)
    top = top_mismatched_columns(mt.read(), k=5, run_id="r1").collect()
    assert [r["column_name"] for r in top] == ["price"]
