"""Histogram/PSI/KS drift detection: bucket semantics (underflow /
overflow / NULL), one-scan-one-shuffle plan shape, and drift flagging."""

import math

from data_migration_validator_spark.validation.drift import (
    drift_report,
    histogram,
    ks_stat,
    psi,
)


def _df(spark):
    vals = [(-5.0,), (0.0,), (2.5,), (5.0,), (9.99,), (10.0,), (25.0,), (None,)]
    return spark.createDataFrame(vals, "x double")


def test_bucket_semantics(spark):
    h = {
        (r["bucket"]): r["n"]
        for r in histogram(_df(spark), {"x": (0.0, 10.0)}, n_buckets=4).collect()
    }
    # width 2.5: -5 underflow→0; 0→1; 2.5→2; 5→3; 9.99→4;
    # 10, 25 overflow→5; NULL→None
    assert h == {0: 1, 1: 1, 2: 1, 3: 1, 4: 1, 5: 2, None: 1}


def test_multi_column_single_pass(spark):
    df = spark.createDataFrame(
        [(float(i), float(i % 10)) for i in range(1000)], "a double, b double"
    )
    h = histogram(df, {"a": (0.0, 1000.0), "b": (0.0, 10.0)}, n_buckets=10)
    rows = h.collect()  # execute so AQE finalizes the plan
    plan = h._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # final AQE plan only
    assert plan.count("Scan") == 1, plan  # both columns share one scan
    assert plan.count("Exchange") == 1, plan  # one partial-agg shuffle
    a_total = sum(r["n"] for r in rows if r["column"] == "a")
    b_total = sum(r["n"] for r in rows if r["column"] == "b")
    assert a_total == b_total == 1000
    # b is uniform over 10 buckets of 100
    b = {r["bucket"]: r["n"] for r in rows if r["column"] == "b"}
    assert all(b[i] == 100 for i in range(1, 11))


def test_psi_ks_math():
    assert psi([10, 20, 30], [10, 20, 30]) == 0.0
    assert ks_stat([10, 20, 30], [10, 20, 30]) == 0.0
    # total shift: all mass moves one bucket
    p, q = [100, 0], [0, 100]
    assert ks_stat(p, q) == 1.0
    assert psi(p, q) > 1.0
    # symmetric
    assert math.isclose(psi(p, q), psi(q, p))


def test_drift_report_flags_rescale(spark):
    src = spark.range(0, 5000).selectExpr("CAST(id % 100 AS DOUBLE) AS x")
    same = spark.range(0, 5000).selectExpr("CAST(id % 100 AS DOUBLE) AS x")
    scaled = src.selectExpr("x * 2.0 AS x")  # unit-change migration bug
    bounds = {"x": (0.0, 200.0)}
    stable = drift_report(src, same, bounds, n_buckets=20).collect()[0]
    assert stable["status"] == "STABLE" and stable["psi"] < 1e-9
    drifted = drift_report(src, scaled, bounds, n_buckets=20).collect()[0]
    assert drifted["status"] == "DRIFT" and drifted["psi"] > 0.25
    assert drifted["src_rows"] == drifted["tgt_rows"] == 5000  # same rows!


def test_bad_bounds_raise(spark):
    import pytest

    with pytest.raises(ValueError):
        histogram(_df(spark), {"x": (5.0, 5.0)})
    with pytest.raises(ValueError):
        histogram(_df(spark), {})


def test_drift_unmeasured_column_reports_no_data(spark):
    # an all-NULL (or non-numeric-regressed) column has zero histogram
    # mass: psi(0,0)=0 must NOT read as "STABLE" — it was never measured
    src = spark.range(0, 100).selectExpr("CAST(NULL AS DOUBLE) AS x")
    tgt = spark.range(0, 100).selectExpr("CAST(NULL AS DOUBLE) AS x")
    row = drift_report(src, tgt, {"x": (0.0, 1.0)}).collect()[0]
    assert row["status"] == "NO_DATA"
    assert row["src_rows"] == 0 and row["tgt_rows"] == 0
