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


# --------------------------------------------------------------------------- #
# pack_shards
# --------------------------------------------------------------------------- #
def _wdf(spark, n=4000):
    """Unique non-monotonic key + skewed non-negative weights."""
    return spark.range(n).select(
        ((F.col("id") * 48271) % 99991).alias("k"),
        ((F.col("id") * 7919) % 503).alias("w"),
    )


def _naive_shards(df, budget):
    win = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(
        "shard_id",
        F.floor(
            (F.sum("w").over(win) - F.col("w")).cast("double") / F.lit(float(budget))
        ).cast("bigint"),
    )


def test_pack_shards_matches_single_partition_window(spark):
    from data_migration_validator_spark.operators.order import pack_shards

    df = _wdf(spark)
    got = {
        (r["k"], r["shard_id"])
        for r in pack_shards(df, "w", ["k"], budget=5000, num_slices=16).collect()
    }
    want = {
        (r["k"], r["shard_id"]) for r in _naive_shards(df, 5000).collect()
    }
    assert got == want
    # shards are contiguous 0..max with every id present
    sids = sorted({s for _, s in got})
    assert sids == list(range(sids[-1] + 1))


def test_pack_shards_no_single_partition_stage(spark):
    from data_migration_validator_spark.operators.order import pack_shards

    out = pack_shards(_wdf(spark), "w", ["k"], budget=5000, num_slices=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__grn_sid" in plan
    assert "SinglePartition" not in plan


def test_pack_shards_edges(spark):
    from data_migration_validator_spark.operators.order import pack_shards

    with pytest.raises(ValueError):
        pack_shards(_wdf(spark, 10), "w", ["k"], budget=0)
    empty = _wdf(spark, 1).filter("k < 0")
    assert pack_shards(empty, "w", ["k"], budget=10).count() == 0
    # NULL weight counts as 0 (row packs into the current shard)
    df = spark.createDataFrame(
        [(1, 7), (2, None), (3, 7)], "k int, w int"
    )
    got = {
        r["k"]: r["shard_id"]
        for r in pack_shards(df, "w", ["k"], budget=10).collect()
    }
    assert got == {1: 0, 2: 0, 3: 0}  # cum_excl: 0, 7, 7 -> all shard 0
    # a doc straddling the boundary belongs to the shard it STARTED in
    df2 = spark.createDataFrame([(1, 9), (2, 9), (3, 1)], "k int, w int")
    got2 = {
        r["k"]: r["shard_id"]
        for r in pack_shards(df2, "w", ["k"], budget=10).collect()
    }
    assert got2 == {1: 0, 2: 0, 3: 1}
