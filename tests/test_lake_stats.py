"""Per-file column stats, predicate file skipping (lake/stats.py), the
clustered-write layout, and the optimistic-concurrency manifest CAS.

Scale rationale: bucket pruning only helps key-equality predicates; the
min/max skipping here is what keeps time-ranged / selective scans
O(matching files) on an append-mostly 100-TB table (Iceberg/Delta data
skipping).  Every pruning test also asserts RESULT equality against the
unpruned filter, so a pruning bug can only ever fail loudly."""

import os
import time

import pytest
from pyspark.sql import functions as F

from data_migration_validator_spark.lake import ConcurrentCommitError, LakeTable

SCHEMA = [
    ("repo", "string"),
    ("path", "string"),
    ("day", "int"),
    ("size", "bigint"),
    ("content", "string"),
]


def _mk(spark, root, name="t", properties=None, num_buckets=4):
    return LakeTable.create(
        spark,
        os.path.join(root, name),
        SCHEMA,
        key_cols=["repo", "path"],
        num_buckets=num_buckets,
        properties=properties,
    )


def _day_rows(spark, day, n=8, content="x"):
    return spark.createDataFrame(
        [(f"r{i}", f"p{day}", "c", day, day * 100 + i, content) for i in range(n)],
        "repo string, path string, commit string, day int, size long, content string",
    ).drop("commit").selectExpr("repo", "path", "day", "size", "content")


def _append_days(spark, t, days):
    for d in days:
        t.append(_day_rows(spark, d))


def _all_stats(t):
    return {e["path"]: e.get("stats") for e in t.manifest["files"]}


def test_stats_collected_on_write(spark, tmp_root):
    t = _mk(spark, tmp_root)
    _append_days(spark, t, [1])
    fid_day = t.schema.field_by_name("day").id
    fid_size = t.schema.field_by_name("size").id
    for e in t.manifest["files"]:
        st = e["stats"]
        lo, hi, nulls, rows = st[str(fid_day)]
        assert lo == 1 and hi == 1 and nulls == 0 and rows >= 1
        lo, hi, _, _ = st[str(fid_size)]
        assert 100 <= lo <= hi <= 107


def test_scan_skips_files_by_range(spark, tmp_root):
    """Each append commit covers one distinct day -> per-file day ranges are
    disjoint across commits; a day-range scan must read only the matching
    commits' files and return exactly the filtered table."""
    t = _mk(spark, tmp_root)
    _append_days(spark, t, [1, 2, 3, 4])
    total = len(t.manifest["files"])
    got = t.scan("day >= 4")
    want = [
        tuple(r) for r in t.read().filter("day >= 4").orderBy("repo").collect()
    ]
    assert [tuple(r) for r in got.orderBy("repo").collect()] == want
    assert 0 < len(got.inputFiles()) <= total // 4
    # IN-list and equality prune the same way
    assert len(t.scan("day IN (2)").inputFiles()) <= total // 4
    # reversed operands and BETWEEN (parsed as two conjuncts) prune too
    assert len(t.scan("3 <= day AND day <= 3").inputFiles()) <= total // 4
    assert t.scan("day BETWEEN 3 AND 3").count() == 8


def test_scan_unsupported_shapes_never_lose_rows(spark, tmp_root):
    t = _mk(spark, tmp_root)
    _append_days(spark, t, [1, 2])
    for pred in (
        "day = 1 OR day = 2",          # OR: no pruning
        "NOT day = 1",                 # NOT: no pruning
        "abs(day) = 2",                # function: no pruning
        "day = 1 AND size > 100",      # mixed: prunes on both conjuncts
    ):
        want = [
            tuple(r)
            for r in t.read().filter(pred).orderBy("repo", "day").collect()
        ]
        got = [
            tuple(r)
            for r in t.scan(pred).orderBy("repo", "day").collect()
        ]
        assert got == want, pred


def test_scan_empty_result_reads_zero_files(spark, tmp_root):
    t = _mk(spark, tmp_root)
    _append_days(spark, t, [1, 2])
    out = t.scan("day > 99")
    assert out.count() == 0
    assert len(out.inputFiles()) == 0


def test_null_bounds_and_null_tests(spark, tmp_root):
    t = _mk(spark, tmp_root)
    t.append(
        spark.createDataFrame(
            [("r1", "p", None, None, "x"), ("r2", "p", None, None, "x")],
            "repo string, path string, day int, size long, content string",
        )
    )
    t.append(_day_rows(spark, 5))
    # IS NOT NULL prunes the all-null file; IS NULL prunes the day-5 files
    nn = t.scan("day IS NOT NULL")
    assert nn.count() == 8 and len(nn.inputFiles()) < len(t.manifest["files"])
    isn = t.scan("day IS NULL")
    assert isn.count() == 2
    # a value test against the all-null file: bounds are open, but
    # nulls == rows proves no non-null value exists — the file is PRUNED,
    # not merely filtered (assert on inputFiles, not just the row count)
    eq = t.scan("day = 5")
    assert eq.count() == 8
    assert len(eq.inputFiles()) < len(t.manifest["files"])
    rng = t.scan("day < 9")
    assert rng.count() == 8
    assert len(rng.inputFiles()) < len(t.manifest["files"])


def test_rename_keeps_old_files_prunable(spark, tmp_root):
    """Stats are keyed by FIELD ID: after a rename, a predicate on the new
    name must still skip files written under the old name."""
    t = _mk(spark, tmp_root)
    _append_days(spark, t, [1, 2])
    t.rename_column("day", "event_day")
    got = t.scan("event_day = 2")
    assert got.count() == 8
    assert len(got.inputFiles()) < len(t.manifest["files"])


def test_string_bounds_truncated_but_sound(spark, tmp_root):
    t = _mk(spark, tmp_root)
    long_a = "a" * 200
    long_z = "z" * 200
    t.append(
        spark.createDataFrame(
            [("r1", "p", 1, 1, long_a), ("r2", "p", 1, 1, long_z)],
            "repo string, path string, day int, size long, content string",
        )
    )
    fid = t.schema.field_by_name("content").id
    for st in _all_stats(t).values():
        ent = st.get(str(fid))
        if ent is None:
            continue
        lo, hi = ent[0], ent[1]
        assert lo is None or len(lo) <= 65
        assert hi is None or len(hi) <= 65
        # upper bound stays a true upper bound after increment-truncate
        assert hi is None or hi >= "z"
    # rows with long values still match through the truncated bounds
    assert t.scan(f"content = '{long_z}'").count() == 1
    assert t.scan("content = 'zz'").count() == 0


def test_update_delete_with_range_predicates(spark, tmp_root):
    t = _mk(spark, tmp_root)
    _append_days(spark, t, [1, 2, 3])
    assert t.update_where("day >= 3", {"content": "'new'"}) == 8
    assert t.read().filter("content = 'new'").count() == 8
    assert t.delete_where("day < 2") == 8
    assert t.row_count() == 16


def test_scan_over_mor_deltas(spark, tmp_root):
    """Stats skipping must not change results when MOR deltas are live: a
    delta row outranks its (possibly skipped) base row either way."""
    t = _mk(spark, tmp_root, properties={"write.merge.mode": "mor"})
    _append_days(spark, t, [1, 2])
    upd = _day_rows(spark, 1).withColumn("content", F.lit("v2")).withColumn(
        "op", F.lit("upsert")
    )
    t.merge(upd, batch_id=1)
    assert t.manifest.get("deltas"), "fixture must exercise the MOR path"
    want = [
        tuple(r)
        for r in t.read().filter("day = 1").orderBy("repo").collect()
    ]
    got = [tuple(r) for r in t.scan("day = 1").orderBy("repo").collect()]
    assert got == want and all(r[4] == "v2" for r in got)


def test_sort_cols_cluster_within_bucket(spark, tmp_root):
    """write.sort.cols orders rows within each written file so row-group
    ranges are narrow; the table round-trips identically."""
    t = _mk(spark, tmp_root, properties={"write.sort.cols": "day,size"})
    df = _day_rows(spark, 1).union(_day_rows(spark, 2)).union(_day_rows(spark, 3))
    t.append(df)
    assert t.row_count() == 24
    assert sorted(tuple(r) for r in t.read().collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    import pyarrow.parquet as pq

    seen_sorted = 0
    for e in t.manifest["files"]:
        tbl = pq.read_table(os.path.join(t.root, e["path"]), columns=["day", "size"])
        pairs = list(zip(tbl.column("day").to_pylist(), tbl.column("size").to_pylist()))
        assert pairs == sorted(pairs)
        seen_sorted += 1
    assert seen_sorted > 0


def test_stats_disabled_by_property(spark, tmp_root):
    t = _mk(spark, tmp_root, properties={"write.stats.cols": ""})
    _append_days(spark, t, [1])
    assert all(st is None for st in _all_stats(t).values())
    # scan still correct, just unpruned
    assert t.scan("day = 1").count() == 8


def test_timestamp_and_date_pruning(spark, tmp_root):
    """TIMESTAMP/DATE literals arrive from the parser in Catalyst internal
    form (micros/days since epoch) and timestamps are written as micros
    (never statless INT96) — both decoded, a time-range scan skips files."""
    t = LakeTable.create(
        spark,
        os.path.join(tmp_root, "ts"),
        [("k", "bigint"), ("ts", "timestamp"), ("d", "date")],
        key_cols=["k"],
        num_buckets=2,
    )
    for month in (1, 2, 3):
        t.append(
            spark.range(month * 10, month * 10 + 5).selectExpr(
                "id AS k",
                f"timestamp'2024-0{month}-10 00:00:00' + "
                "make_interval(0,0,0,cast(id % 5 as int),0,0,0) AS ts",
                f"date'2024-0{month}-10' AS d",
            )
        )
    total = len(t.manifest["files"])
    got = t.scan("ts >= TIMESTAMP '2024-03-01 00:00:00'")
    assert got.count() == 5 and 0 < len(got.inputFiles()) < total
    gd = t.scan("d = DATE '2024-02-10'")
    assert gd.count() == 5 and 0 < len(gd.inputFiles()) < total
    # bare string literal against a timestamp column prunes too
    gs = t.scan("ts < '2024-02-01 00:00:00'")
    assert gs.count() == 5 and 0 < len(gs.inputFiles()) < total


def test_bucket_prune_timestamp_key_correct(spark, tmp_root):
    """A TIMESTAMP literal pinning the bucket column must hash the decoded
    instant (the raw Catalyst long would bucket wrongly and silently skip
    matching rows in UPDATE/DELETE)."""
    t = LakeTable.create(
        spark,
        os.path.join(tmp_root, "tk"),
        [("ts", "timestamp"), ("v", "string")],
        key_cols=["ts"],
        num_buckets=8,
    )
    t.append(
        spark.range(16).selectExpr(
            "timestamp'2024-01-01 00:00:00' + "
            "make_interval(0,0,0,0,cast(id as int),0,0) AS ts",
            "'old' AS v",
        )
    )
    n = t.update_where("ts = TIMESTAMP '2024-01-01 03:00:00'", {"v": "'new'"})
    assert n == 1
    assert t.read().filter("v = 'new'").count() == 1
    assert t.delete_where("ts = TIMESTAMP '2024-01-01 05:00:00'") == 1
    assert t.row_count() == 15


def test_cross_type_literal_never_prunes_string_column(spark, tmp_root):
    """Spark compares string-vs-numeric by NUMERIC coercion; a lexical
    interval test on the stored string bounds would wrongly prune (e.g.
    '10' > 9 is TRUE numerically, FALSE lexically).  Numeric literals on a
    string column must build no test; string literals still prune."""
    t = _mk(spark, tmp_root)
    t.append(
        spark.createDataFrame(
            [("r1", "p", 1, 1, "10"), ("r2", "p", 1, 1, "9")],
            "repo string, path string, day int, size long, content string",
        )
    )
    got = [tuple(r) for r in t.scan("content > 9").collect()]
    want = [tuple(r) for r in t.read().filter("content > 9").collect()]
    assert sorted(got) == sorted(want) and len(got) == 1  # the '10' row
    got = t.scan("content = 9").count()
    assert got == t.read().filter("content = 9").count() == 1
    # string literal on the string column: lexical both sides, prunes fine
    assert t.scan("content = '10'").count() == 1


def test_decimal_literal_never_prunes_string_column(spark, tmp_root):
    """A fractional literal parses as DECIMAL; decoding it to str would
    masquerade as string-domain-comparable and lexically prune the file
    holding '1.50' (which MATCHES ``content = 1.5`` under Spark's numeric
    coercion).  Decimal literals must decode as Decimal and be dropped by
    the string-domain guard in BOTH pruners."""
    t = _mk(spark, tmp_root)
    t.append(
        spark.createDataFrame(
            [("r1", "p", 1, 1, "1.50"), ("r2", "p", 1, 1, "2.75")],
            "repo string, path string, day int, size long, content string",
        )
    )
    got = [tuple(r) for r in t.scan("content = 1.5").collect()]
    want = [tuple(r) for r in t.read().filter("content = 1.5").collect()]
    assert sorted(got) == sorted(want) and len(got) == 1  # the '1.50' row
    # decimal literal on a NUMERIC column still prunes exactly
    rng = t.scan("size <= 1.0")
    assert rng.count() == 2


def test_numeric_literal_never_bucket_prunes_string_key(spark, tmp_root):
    """``repo = 10`` casts the STRING bucket column to bigint (ANSI), so
    rows '10' and ' 10' both match yet hash to different buckets — the
    bucket pruner must forgo pruning (scan/update/delete would otherwise
    silently miss rows outside lit('10')'s bucket)."""
    t = _mk(spark, tmp_root, num_buckets=8)
    rows = [("10", "p", 1, 1, "x"), (" 10", "p", 1, 1, "x"), ("9", "p", 1, 1, "x")]
    t.append(
        spark.createDataFrame(
            rows,
            "repo string, path string, day int, size long, content string",
        )
    )
    assert t._buckets_from_predicate("repo = 10") is None
    got = sorted(r["repo"] for r in t.scan("repo = 10").collect())
    want = sorted(r["repo"] for r in t.read().filter("repo = 10").collect())
    assert got == want and len(got) == 2  # '10' and ' 10'
    n = t.update_where("repo = 10", {"content": "'seen'"})
    assert n == 2
    # a string literal still prunes (exact domain)
    assert t._buckets_from_predicate("repo = '10'") is not None


def test_out_of_range_timestamp_literal_degrades_gracefully(spark, tmp_root):
    """Spark timestamps run to year 294276; python's datetime stops at
    9999.  A max-sentinel literal must not crash scan/update — the conjunct
    is dropped and the scan runs unpruned."""
    t = LakeTable.create(
        spark,
        os.path.join(tmp_root, "bigts"),
        [("k", "bigint"), ("ts", "timestamp")],
        key_cols=["k"],
        num_buckets=2,
    )
    t.append(
        spark.range(5).selectExpr(
            "id AS k", "timestamp'2024-01-10 00:00:00' AS ts"
        )
    )
    got = t.scan("ts < TIMESTAMP '10000-01-01 00:00:00'")
    assert got.count() == 5
    # pinning the BUCKET column with an overflow literal must also degrade
    t2 = LakeTable.create(
        spark,
        os.path.join(tmp_root, "bigts2"),
        [("ts", "timestamp"), ("v", "string")],
        key_cols=["ts"],
        num_buckets=2,
    )
    t2.append(
        spark.sql("SELECT timestamp'2024-01-01 00:00:00' AS ts, 'a' AS v")
    )
    assert t2._buckets_from_predicate("ts = TIMESTAMP '10000-01-01 00:00:00'") is None
    assert t2.scan("ts = TIMESTAMP '10000-01-01 00:00:00'").count() == 0


def test_widen_to_string_scrubs_stale_stats(spark, tmp_root):
    """int->string widening moves the column to LEXICAL comparison, where
    the stored numeric bounds are meaningless ('11' < '9'); the widen must
    scrub that field's stats so old files stay reachable."""
    t = _mk(spark, tmp_root)
    _append_days(spark, t, [9, 11])
    fid = str(t.schema.field_by_name("day").id)
    assert any(fid in (e.get("stats") or {}) for e in t.manifest["files"])
    t.widen_type("day", "string")
    assert all(fid not in (e.get("stats") or {}) for e in t.manifest["files"])
    got = t.scan("day = '11'")
    assert got.count() == 8
    # same-domain widen keeps stats usable: size bigint stays pruned
    assert len(t.scan("size >= 1100").inputFiles()) < len(t.manifest["files"])


def test_date_column_timestamp_literal_boundary(spark, tmp_root):
    """A non-midnight TIMESTAMP literal on a DATE column promotes the
    COLUMN to timestamp in Spark (midnight instants), so `d < ts(05:00)`
    must keep the boundary date's file."""
    t = LakeTable.create(
        spark,
        os.path.join(tmp_root, "dts"),
        [("k", "bigint"), ("d", "date")],
        key_cols=["k"],
        num_buckets=2,
    )
    t.append(spark.range(4).selectExpr("id AS k", "date'2024-02-10' AS d"))
    t.append(spark.range(10, 14).selectExpr("id AS k", "date'2024-03-05' AS d"))
    for pred, n in (
        ("d < TIMESTAMP '2024-02-10 05:00:00'", 4),   # boundary must match
        ("d >= TIMESTAMP '2024-02-10 05:00:00'", 4),  # only the March file
        ("d > TIMESTAMP '2024-03-05 00:00:00'", 0),
        ("d <= TIMESTAMP '2024-03-04 23:00:00'", 4),
        ("d = TIMESTAMP '2024-02-10 00:00:00'", 4),   # midnight: exact
    ):
        got = t.scan(pred)
        want = t.read().filter(pred)
        assert got.count() == want.count() == n, pred
    # non-midnight comparisons still prune the provably-disjoint file
    assert (
        0
        < len(t.scan("d >= TIMESTAMP '2024-02-11 05:00:00'").inputFiles())
        < len(t.manifest["files"])
    )


def test_vacuum_grace_protects_young_orphans(spark, tmp_root):
    """expire_snapshots must not delete a YOUNG unreferenced data file —
    it may belong to a concurrent writer that has written its snap dir but
    not yet won the manifest CAS.  min_age_s gates data files too."""
    t = _mk(spark, tmp_root)
    _append_days(spark, t, [1, 2])
    orphan_dir = os.path.join(t.root, "data", "snap-99999999-deadbeef")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-0.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not-yet-committed")
    out = t.expire_snapshots(keep_last=1, min_age_s=3600)
    assert os.path.exists(orphan), "young orphan must survive the grace period"
    old = time.time() - 7200
    os.utime(orphan, (old, old))
    t.expire_snapshots(keep_last=1, min_age_s=3600)
    assert not os.path.exists(orphan), "aged-out orphan is reclaimed"
    assert out["manifests_removed"] >= 0


def test_write_restores_session_timestamp_conf(spark, tmp_root):
    """Lake writes pin TIMESTAMP_MICROS for their own files but must not
    leave the session conf changed for unrelated writes."""
    key = "spark.sql.parquet.outputTimestampType"
    prior = spark.conf.get(key)
    try:
        spark.conf.set(key, "INT96")
        t = _mk(spark, tmp_root)
        _append_days(spark, t, [1])
        assert spark.conf.get(key) == "INT96"
        # ...and the lake file itself still carried stats (written as micros)
        assert any(e.get("stats") for e in t.manifest["files"])
    finally:
        spark.conf.set(key, prior)


def test_ts_pin_refcounted_across_writers(spark):
    """The micros pin is refcounted per session: an inner writer finishing
    must NOT restore the caller conf while an outer write is still running
    (the multi-writer race the CAS commit protocol otherwise invites)."""
    from data_migration_validator_spark.lake.table import _pin_micros_timestamps

    key = "spark.sql.parquet.outputTimestampType"
    prior = spark.conf.get(key)
    try:
        spark.conf.set(key, "INT96")
        with _pin_micros_timestamps(spark):
            assert spark.conf.get(key) == "TIMESTAMP_MICROS"
            with _pin_micros_timestamps(spark):
                assert spark.conf.get(key) == "TIMESTAMP_MICROS"
            # inner exit: outer pin still holds the conf
            assert spark.conf.get(key) == "TIMESTAMP_MICROS"
        # last writer out restores the caller's value
        assert spark.conf.get(key) == "INT96"
    finally:
        spark.conf.set(key, prior)


def test_rename_patches_sort_and_stats_properties(spark, tmp_root):
    """Renaming a write.sort.cols / write.stats.cols column must keep the
    clustered-write layout and stats collection working (a stale name would
    make every later write raise on an unresolved sort column)."""
    t = _mk(
        spark,
        tmp_root,
        properties={"write.sort.cols": "day", "write.stats.cols": "day,size"},
    )
    _append_days(spark, t, [1])
    t.rename_column("day", "event_day")
    assert t.manifest["properties"]["write.sort.cols"] == "event_day"
    assert t.manifest["properties"]["write.stats.cols"] == "event_day,size"
    # the next write sorts and collects stats under the new name
    t.append(
        spark.createDataFrame(
            [(f"r{i}", "p2", 2, 200 + i, "x") for i in range(8)],
            "repo string, path string, event_day int, size long, content string",
        )
    )
    fid = t.schema.field_by_name("event_day").id
    new_entries = [e for e in t.manifest["files"] if e["schema_id"] == t.manifest["schema_id"]]
    assert new_entries and all(str(fid) in (e.get("stats") or {}) for e in new_entries)
    got = t.scan("event_day = 2")
    assert got.count() == 8
    assert len(got.inputFiles()) < len(t.manifest["files"])


def test_concurrent_commit_cas(spark, tmp_root):
    """Two handles race one sequence number: exactly one wins, the loser
    gets a typed error, stays on its own snapshot, and succeeds after
    reloading (the documented recovery)."""
    a = _mk(spark, tmp_root)
    b = LakeTable.load(spark, a.root)
    a.append(_day_rows(spark, 1))
    with pytest.raises(ConcurrentCommitError):
        b.append(_day_rows(spark, 2))
    assert b.manifest["seq"] == 1  # loser not advanced past its snapshot
    b2 = LakeTable.load(spark, a.root)
    b2.append(_day_rows(spark, 2))
    assert b2.row_count() == 16
