"""Two-phase global row_number (operators/order.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_migration_validator_spark.operators.order import global_row_number


def _df(spark, n=5000):
    # non-monotonic key so range slicing actually reorders
    return spark.range(n).select(
        ((F.col("id") * 48271) % 99991).alias("k"),
        F.col("id").alias("payload"),
    )


def test_matches_single_partition_window(spark):
    df = _df(spark, 5000)
    got = {
        (r["k"], r["row_num"])
        for r in global_row_number(df, ["k"], num_slices=16).collect()
    }
    want = {
        (r["k"], r["row_num"])
        for r in df.withColumn(
            "row_num", F.row_number().over(Window.orderBy("k")).cast("bigint")
        ).collect()
    }
    assert got == want


def test_deterministic_across_layouts(spark):
    df = _df(spark, 3000)
    a = {
        (r["k"], r["row_num"])
        for r in global_row_number(df, ["k"], num_slices=8).collect()
    }
    b = {
        (r["k"], r["row_num"])
        for r in global_row_number(
            df.repartition(13), ["k"], num_slices=32
        ).collect()
    }
    assert a == b


def test_no_single_partition_window_stage(spark):
    df = _df(spark, 1000)
    plan = (
        global_row_number(df, ["k"], num_slices=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the data goes through a keyed hash exchange, never a SinglePartition
    # one (the naive global window would warn and collapse to 1 task)
    assert "hashpartitioning(__grn_sid" in plan
    assert "singlepartition" not in plan.lower()


def test_multi_column_order_and_nulls(spark):
    rows = [(None, 1), (3, 2), (1, 9), (1, 2), (None, 0), (2, 5)]
    df = spark.createDataFrame(rows, "a int, b int")
    got = {
        (r["a"], r["b"]): r["row_num"]
        for r in global_row_number(df, ["a", "b"], num_slices=3).collect()
    }
    want = {
        (r["a"], r["b"]): r["row_num"]
        for r in df.withColumn(
            "row_num",
            F.row_number().over(Window.orderBy("a", "b")).cast("bigint"),
        ).collect()
    }
    assert got == want  # NULLs first, then (1,2),(1,9),(2,5),(3,2)


def test_collision_and_edge_cases(spark):
    df = _df(spark, 100).withColumn("__grn_pid", F.lit("keep"))
    out = global_row_number(df, ["k"], num_slices=4)
    assert "__grn_pid" in out.columns
    assert out.where(F.col("__grn_pid") != "keep").count() == 0
    assert out.count() == 100

    empty = _df(spark, 10).where("k < 0")
    assert global_row_number(empty, ["k"]).count() == 0

    with pytest.raises(ValueError):
        global_row_number(df, [])


def test_tiny_sample_fraction_never_zeroes_threshold(spark, monkeypatch):
    """At 10^10-row scale int(frac * _HASH_MOD) truncates to 0, which would
    sample NOTHING and collapse every row into one window partition.
    Simulate by shrinking _HASH_MOD so frac * mod < 1 at test scale: the
    max(1, ...) floor must keep the sample non-empty and the result exact."""
    from data_migration_validator_spark.operators import order as order_mod

    monkeypatch.setattr(order_mod, "_HASH_MOD", 2)
    df = _df(spark, 4000)
    # frac = 16*200/4000 = 0.8 -> int(0.8*2)=1 fine; force tiny frac instead
    got_df = global_row_number(df, ["k"], num_slices=4, sample_per_slice=1)
    # frac = 4/4000 = 0.001 -> int(0.001*2) == 0 without the floor
    got = {(r["k"], r["row_num"]) for r in got_df.collect()}
    want = {
        (r["k"], r["row_num"])
        for r in df.withColumn(
            "row_num", F.row_number().over(Window.orderBy("k")).cast("bigint")
        ).collect()
    }
    assert got == want
    # and the plan still slices (h < 1 keeps ~half the rows under mod 2)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__grn_sid" in plan
