"""As-of join and sessionization operators: value-level oracles computed
by brute force, tie/strict/tolerance semantics, and plan-shape checks
(one exchange each — the scale contract)."""

import datetime as dt

import pyspark.sql.functions as F

from data_migration_validator_spark.operators.asof import asof_join
from data_migration_validator_spark.operators.sessions import (
    session_stats,
    sessionize,
)


def _ts(m):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


def _brute_asof(left_rows, right_rows, strict=False, tolerance=None):
    """Per left row: the right row with max ts <= (or <) left ts, same key;
    greatest tie wins.  Rows are (key, ts, payload)."""
    out = {}
    for lk, lt, _ in left_rows:
        best = None
        for rk, rt, rv in right_rows:
            if rk != lk:
                continue
            ok = rt < lt if strict else rt <= lt
            if tolerance is not None:
                ok = ok and (lt - rt).total_seconds() <= tolerance
            if ok and (best is None or (rt, rv) > (best[0], best[1])):
                best = (rt, rv)
        out[(lk, lt)] = best
    return out


def test_asof_matches_bruteforce(spark):
    left = [("a", _ts(m), f"L{m}") for m in (0, 5, 10, 17, 30)] + [
        ("b", _ts(3), "Lb3"),
        ("c", _ts(9), "Lc9"),  # no right rows for c at all
    ]
    right = [("a", _ts(m), m) for m in (1, 5, 12, 25)] + [("b", _ts(2), 99)]
    l_df = spark.createDataFrame(left, "k string, ts timestamp, lv string")
    r_df = spark.createDataFrame(right, "k string, ts timestamp, rv int")

    for strict in (False, True):
        got = {
            (r["k"], r["ts"]): (r["ts_right"], r["rv"])
            if r["rv"] is not None
            else None
            for r in asof_join(
                l_df, r_df, on=["k"], left_ts="ts", strict=strict
            ).collect()
        }
        assert got == _brute_asof(left, right, strict=strict)


def test_asof_tolerance_nulls_stale_matches(spark):
    left = [("a", _ts(60), "L")]
    right = [("a", _ts(0), 7)]
    l_df = spark.createDataFrame(left, "k string, ts timestamp, lv string")
    r_df = spark.createDataFrame(right, "k string, ts timestamp, rv int")
    loose = asof_join(l_df, r_df, on=["k"], left_ts="ts", tolerance=3601).first()
    tight = asof_join(l_df, r_df, on=["k"], left_ts="ts", tolerance=3599).first()
    assert loose["rv"] == 7
    assert tight["rv"] is None and tight["ts_right"] is None


def test_asof_right_ties_take_greatest_tie(spark):
    l_df = spark.createDataFrame(
        [("a", _ts(10), "L")], "k string, ts timestamp, lv string"
    )
    r_df = spark.createDataFrame(
        [("a", _ts(1), 1, "first"), ("a", _ts(1), 2, "second")],
        "k string, ts timestamp, tie int, rv string",
    )
    row = asof_join(
        l_df, r_df, on=["k"], left_ts="ts", right_cols=["rv"], right_tie="tie"
    ).first()
    assert row["rv"] == "second"


def test_asof_single_shuffle_no_join(spark):
    l_df = spark.createDataFrame([("a", _ts(1), "x")], "k string, ts timestamp, lv string")
    r_df = spark.createDataFrame([("a", _ts(0), 1)], "k string, ts timestamp, rv int")
    plan = (
        asof_join(l_df, r_df, on=["k"], left_ts="ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan  # union + window, never a join node
    # one real exchange on the key (ignore AQE re-reads of the same shuffle)
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_null_ts_and_null_key_right_rows_never_match(spark):
    # a NULL-ts right row sorts first under nulls-first ordering — without
    # the guard its payload would be carried onto every left row; NULL keys
    # group as equal in partitionBy but must not equi-match
    l_df = spark.createDataFrame(
        [("a", _ts(10), "L"), (None, _ts(10), "Lnull")],
        "k string, ts timestamp, lv string",
    )
    r_df = spark.createDataFrame(
        [("a", None, 5), (None, _ts(0), 6)],
        "k string, ts timestamp, rv int",
    )
    rows = {r["lv"]: r["rv"] for r in
            asof_join(l_df, r_df, on=["k"], left_ts="ts").collect()}
    assert rows == {"L": None, "Lnull": None}


def test_asof_tolerance_exact_boundary_kept(spark):
    # exactly-at-tolerance must match (integer-µs arithmetic; a double
    # epoch comparison can flip this boundary)
    l_df = spark.createDataFrame(
        [("a", _ts(30), "L")], "k string, ts timestamp, lv string"
    )
    r_df = spark.createDataFrame(
        [("a", _ts(0), 7)], "k string, ts timestamp, rv int"
    )
    row = asof_join(l_df, r_df, on=["k"], left_ts="ts", tolerance=1800.0).first()
    assert row["rv"] == 7


def test_asof_right_cols_including_ts_no_collision(spark):
    # rts inside right_cols must not produce two identically-named struct
    # fields; the matched timestamp arrives once, as ts_right
    l_df = spark.createDataFrame(
        [("a", _ts(10), "L")], "k string, ts timestamp, lv string"
    )
    r_df = spark.createDataFrame(
        [("a", _ts(1), 3)], "k string, ts timestamp, rv int"
    )
    out = asof_join(
        l_df, r_df, on=["k"], left_ts="ts", right_cols=["ts", "rv"]
    )
    assert out.columns.count("ts_right") == 1
    row = out.first()
    assert row["rv"] == 3 and row["ts_right"] == _ts(1)


def test_sessionize_boundaries_and_stats(spark):
    rows = [
        # user 1: events at 0,10,20 min (one session at 15-min gap),
        # then 60 (new), 75 exactly at the 15-min boundary (continues)
        (1, _ts(0)), (1, _ts(10)), (1, _ts(20)), (1, _ts(60)), (1, _ts(75)),
        # user 2: single event
        (2, _ts(5)),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    sess = sessionize(df, ["user_id"], "ts", gap_s=900)
    got = {
        (r["user_id"], r["ts"].minute + r["ts"].hour * 60): r["session_id"]
        for r in sess.collect()
    }
    assert got == {(1, 0): 1, (1, 10): 1, (1, 20): 1, (1, 60): 2, (1, 75): 2, (2, 5): 1}

    stats = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["duration_us"])
        for r in session_stats(df, ["user_id"], "ts", gap_s=900).collect()
    }
    assert stats == {
        (1, 1): (3, 1_200_000_000),
        (1, 2): (2, 900_000_000),
        (2, 1): (1, 0),
    }


def test_sessionize_single_exchange(spark):
    df = spark.createDataFrame([(1, _ts(0))], "user_id int, ts timestamp")
    plan = (
        session_stats(df, ["user_id"], "ts", gap_s=900)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the two windows fuse into one sort+window over one exchange, and the
    # rollup rides the same partitioning (partial agg only)
    assert plan.count("Exchange hashpartitioning") == 1
