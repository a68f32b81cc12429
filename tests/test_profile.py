"""Column profiler: exact stats vs hand truth, typed min/max slots,
single-pass plan shape, and the zero-join profile compare."""

import datetime

from data_migration_validator_spark.validation.profile import (
    profile_columns,
    profile_compare,
    profile_quantiles,
)

TS = datetime.datetime


def _df(spark):
    rows = [
        (1, "b", 2.5, TS(2024, 1, 1)),
        (2, "a", -1.0, TS(2024, 3, 1)),
        (2, None, 4.0, None),
        (None, "c", 4.0, TS(2024, 2, 1)),
    ]
    return spark.createDataFrame(rows, "id int, s string, x double, t timestamp")


def test_exact_profile_values(spark):
    prof = {r["column"]: r for r in
            profile_columns(_df(spark), exact_distinct=True).collect()}
    p = prof["id"]
    assert (p["n_rows"], p["n_nulls"], p["n_distinct"]) == (4, 1, 2)
    assert (p["min_num"], p["max_num"]) == (1.0, 2.0)
    assert p["min_str"] is None and p["min_ts"] is None
    s = prof["s"]
    assert (s["n_nulls"], s["n_distinct"], s["min_str"], s["max_str"]) == (
        1, 3, "a", "c")
    assert s["min_num"] is None
    x = prof["x"]
    assert (x["n_distinct"], x["min_num"], x["max_num"]) == (3, -1.0, 4.0)
    t = prof["t"]
    assert (t["n_nulls"], t["min_ts"], t["max_ts"]) == (
        1, TS(2024, 1, 1), TS(2024, 3, 1))
    assert t["dtype"] == "timestamp"


def test_profile_is_one_aggregation_pass(spark):
    df = _df(spark)
    seen = []
    orig = type(df).agg

    def spy(self, *a, **k):
        out = orig(self, *a, **k)
        seen.append(out._jdf.queryExecution().executedPlan().toString())
        return out

    type(df).agg = spy
    try:
        profile_columns(df)  # approx mode: the 100-TB single pass
    finally:
        type(df).agg = orig
    assert len(seen) == 1
    assert seen[0].count("Scan ") == 1, seen[0]
    assert "Expand" not in seen[0]  # HLL sketches, no distinct expand


def test_compare_flags_injected_drift(spark):
    src = _df(spark)
    tgt = spark.createDataFrame(
        [
            (1, "b", 2.5, TS(2024, 1, 1)),
            (2, "a", -1.0, TS(2024, 3, 1)),
            (2, None, 9.0, None),          # x mutated: max drifts
            (None, "c", 4.0, TS(2024, 2, 1)),
        ],
        "id int, s string, x double, t timestamp",
    )
    diff = profile_compare(src, tgt, exact_distinct=True).collect()
    got = {(r["column"], r["metric"]): (r["src_value"], r["tgt_value"])
           for r in diff}
    assert got[("x", "max_num")] == ("4.0", "9.0")
    assert ("id", "n_rows") not in got
    # identical tables → empty diff
    assert profile_compare(src, src, exact_distinct=True).count() == 0


def test_compare_distinct_tolerance(spark):
    src = spark.range(0, 5000).selectExpr("id", "CAST(id AS STRING) AS s")
    tgt = src.filter("id < 4990")  # drops rows: n_rows must still flag
    diff = profile_compare(
        src, tgt, exact_distinct=False, distinct_rtol=0.05
    ).collect()
    metrics = {(r["column"], r["metric"]) for r in diff}
    assert ("id", "n_rows") in metrics
    # approx distinct within 5% tolerance is NOT flagged
    assert ("id", "n_distinct") not in metrics


def test_unknown_column_raises(spark):
    import pytest

    with pytest.raises(ValueError):
        profile_columns(_df(spark), cols=["nope"])


def test_compare_nan_on_both_sides_is_agreement(spark):
    # NaN != NaN in Python — without the NaN-aware diff a double column
    # whose max is NaN on BOTH sides flags forever on identical tables
    df = spark.createDataFrame(
        [(1, 1.0), (2, float("nan"))], "id int, x double"
    )
    diff = profile_compare(df, df, exact_distinct=True).collect()
    assert diff == []


def test_profile_quantiles_exact_and_approx(spark):
    df = spark.range(0, 1001).selectExpr("CAST(id AS DOUBLE) AS x")
    got = {
        (r["column"], r["p"]): r["value"]
        for r in profile_quantiles(df, ["x"], probs=(0.0, 0.5, 1.0)).collect()
    }
    assert got == {("x", 0.0): 0.0, ("x", 0.5): 500.0, ("x", 1.0): 1000.0}
    # sketch mode agrees within its accuracy budget on a smooth column
    approx = {
        r["p"]: r["value"]
        for r in profile_quantiles(
            df, ["x"], probs=(0.5,), exact=False
        ).collect()
    }
    assert abs(approx[0.5] - 500.0) <= 5.0
    import pytest

    with pytest.raises(ValueError):
        profile_quantiles(df, ["nope"])
    with pytest.raises(ValueError):
        profile_quantiles(df, [])
