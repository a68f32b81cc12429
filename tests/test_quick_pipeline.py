"""Quick-validation strategy (semi-join reduction) and the end-to-end
validation pipeline orchestrator."""

import pytest
from pyspark.sql import functions as F

from data_migration_validator_spark.validation import (
    anomalous_keys,
    quick_validate,
    run_validation,
)


@pytest.fixture(scope="module")
def pair(spark):
    src = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id int, name string, score double",
    )
    tgt = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 99.0), (3, "c", 30.0), (5, "e", 50.0)],
        "id int, name string, score double",
    )
    return src, tgt


def test_quick_validate_finds_exactly_the_anomalies(pair):
    src, tgt = pair
    out = quick_validate(src, tgt, ["id"])
    keys = {(r["id"], r["status"]) for r in out["keys"].collect()}
    assert keys == {(2, "MISMATCH"), (4, "SRC_EXTRA"), (5, "TGT_EXTRA")}
    assert {r["id"] for r in out["src_rows"].collect()} == {2, 4}
    assert {r["id"] for r in out["tgt_rows"].collect()} == {2, 5}


def test_anomalous_keys_cap_reproduces_reference_limit(pair):
    src, tgt = pair
    assert anomalous_keys(src, tgt, ["id"], limit=1).count() == 1


def test_run_validation_pipeline_failure_case(pair):
    src, tgt = pair
    reports = run_validation(src, tgt, ["id"], date_col=None)
    s = reports["summary"]
    assert s["validation_status"] == "FAILED"
    assert s["mismatches"] == 1 and s["src_extras"] == 1 and s["tgt_extras"] == 1
    assert s["primary_key_compliance_status"] == "SUCCESS"
    assert s["column_names_status"] == "SUCCESS"
    bad_cols = {
        r["column_name"]
        for r in reports["column_metrics"].filter(F.col("mismatches") > 0).collect()
    }
    assert bad_cols == {"score"}


def test_run_validation_pipeline_success_case(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    reports = run_validation(df, df, ["id"])
    assert reports["summary"]["validation_status"] == "SUCCESS"


def test_run_validation_quick_strategy(pair):
    src, tgt = pair
    reports = run_validation(src, tgt, ["id"], quick=True)
    assert "quick" in reports
    assert reports["quick"]["keys"].count() == 3
