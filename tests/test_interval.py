"""Bucketed range join: equivalence to the naive theta-join, no
nested-loop in the plan, left/closed variants."""

import random

import pytest
from pyspark.sql import functions as F

from data_migration_validator_spark.operators.interval import range_join


def _fixture(spark, seed=7, n_points=400, n_intervals=120):
    rng = random.Random(seed)
    pts = [(i, rng.choice("ab"), rng.uniform(0, 1000.0)) for i in range(n_points)]
    ivs = []
    for j in range(n_intervals):
        s = rng.uniform(0, 1000.0)
        ivs.append((j, rng.choice("ab"), s, s + rng.uniform(0.1, 120.0)))
    points = spark.createDataFrame(pts, "pid int, k string, ts double")
    intervals = spark.createDataFrame(ivs, "iid int, k string, s double, e double")
    return points, intervals


def _naive(points, intervals, closed=False):
    upper = F.col("ts") <= F.col("e") if closed else F.col("ts") < F.col("e")
    return (
        points.join(intervals, on="k")
        .filter((F.col("ts") >= F.col("s")) & upper)
        .select("pid", "iid")
    )


@pytest.mark.parametrize("width", [10.0, 50.0, 500.0, 5000.0])
def test_matches_naive_at_any_bucket_width(spark, width):
    points, intervals = _fixture(spark)
    got = range_join(
        points, intervals, "ts", "s", "e", on=["k"], bucket_width_s=width
    )
    want = {(r["pid"], r["iid"]) for r in _naive(points, intervals).collect()}
    assert {(r["pid"], r["iid"]) for r in got.select("pid", "iid").collect()} == want
    assert len(want) > 50  # fixture is non-trivial
    # exactly one row per matching pair — no dedup pass needed
    assert got.count() == len(want)


def test_closed_end_matches_between(spark):
    points = spark.createDataFrame([(1, 10.0), (2, 20.0)], "pid int, ts double")
    ivs = spark.createDataFrame([(1, 0.0, 10.0)], "iid int, s double, e double")
    half = range_join(points, ivs, "ts", "s", "e", bucket_width_s=5.0)
    closed = range_join(
        points, ivs, "ts", "s", "e", bucket_width_s=5.0, closed_end=True
    )
    assert half.count() == 0  # 10 excluded from [0, 10)
    assert [r["pid"] for r in closed.collect()] == [1]


def test_left_join_keeps_unmatched_points(spark):
    points, intervals = _fixture(spark, n_points=100)
    got = range_join(
        points, intervals, "ts", "s", "e", on=["k"], bucket_width_s=100.0,
        how="left",
    )
    matched = {(r["pid"], r["iid"])
               for r in got.filter("iid IS NOT NULL").collect()}
    want = {(r["pid"], r["iid"]) for r in _naive(points, intervals).collect()}
    assert matched == want
    # every point appears; unmatched carry NULL interval columns
    assert set(r["pid"] for r in got.collect()) == set(range(100))


def test_no_nested_loop_in_plan(spark):
    points, intervals = _fixture(spark)
    got = range_join(
        points, intervals, "ts", "s", "e", on=["k"], bucket_width_s=50.0
    )
    got.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
    assert "Cartesian" not in plan, plan


def test_timestamp_axis(spark):
    points = spark.createDataFrame(
        [(1, "2024-01-01 06:00:00"), (2, "2024-01-05 00:00:00")],
        "pid int, ts string",
    ).select("pid", F.col("ts").cast("timestamp").alias("ts"))
    ivs = spark.createDataFrame(
        [(7, "2024-01-01 00:00:00", "2024-01-02 00:00:00")],
        "iid int, s string, e string",
    ).select(
        "iid",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    got = range_join(points, ivs, "ts", "s", "e", bucket_width_s=3600.0)
    assert [r["pid"] for r in got.collect()] == [1]


def test_input_validation(spark):
    points, intervals = _fixture(spark)
    with pytest.raises(ValueError):
        range_join(points, intervals, "ts", "s", "e", bucket_width_s=0)
    with pytest.raises(ValueError):
        range_join(points, intervals, "ts", "s", "e", how="outer")
    mixed = intervals.withColumn("s", F.col("s").cast("timestamp"))
    with pytest.raises(ValueError):
        range_join(points, mixed, "ts", "s", "e")
