"""Time travel (``at_version``) and change data feed (``changes``).

Iceberg ``VERSION AS OF`` / Delta ``table_changes`` analogs over the
manifest snapshot store: a pinned handle resolves every read against one
committed manifest (and refuses writes); ``changes`` snapshot-diffs two
manifests into net insert / update_postimage / delete rows with ONE
full-outer join.  The reference has no CDF surface — this extends the
engine for downstream incremental consumers of the replayed table.
"""

import os

import pytest

from data_migration_validator_spark.lake import LakeTable
from data_migration_validator_spark.streaming.stream import run_stream_once

SCHEMA = [
    ("repo", "string"),
    ("path", "string"),
    ("commit", "string"),
    ("lang", "string"),
    ("content", "string"),
]
DDL = "repo string, path string, commit string, lang string, content string, op string"


def _mk(spark, root, name="t", **kw):
    kw.setdefault("num_buckets", 4)
    return LakeTable.create(
        spark, os.path.join(root, name), SCHEMA, key_cols=["repo", "path"], **kw
    )


def _changes(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


BASE = [
    ("r1", "a.py", "c0", "py", "a0", "insert"),
    ("r1", "b.py", "c0", "py", "b0", "insert"),
    ("r2", "a.py", "c0", "py", "a0", "insert"),
    ("r3", "z.py", "c0", "py", "z0", "insert"),
]

NEXT = [
    ("r1", "a.py", "c1", "py", "a1", "update"),  # update_postimage
    ("r3", "z.py", "c1", "py", None, "delete"),  # delete
    ("r4", "n.py", "c1", "py", "n0", "insert"),  # insert
]


def test_at_version_reads_old_snapshot(spark, tmp_root):
    t = _mk(spark, tmp_root)
    t.merge(_changes(spark, BASE), batch_id=0)
    seq_base = t.manifest["seq"]
    t.merge(_changes(spark, NEXT), batch_id=1)

    old = t.at_version(seq_base)
    assert {r["repo"] for r in old.read().collect()} == {"r1", "r2", "r3"}
    assert old.row_count() == 4
    # live handle unaffected
    assert {r["repo"] for r in t.read().collect()} == {"r1", "r2", "r4"}
    # detail/schema resolve against the pinned manifest
    assert old.detail()["seq"] == seq_base


def test_at_version_is_read_only(spark, tmp_root):
    t = _mk(spark, tmp_root)
    t.merge(_changes(spark, BASE), batch_id=0)
    old = t.at_version(t.manifest["seq"])
    with pytest.raises(RuntimeError, match="read-only"):
        old.merge(_changes(spark, NEXT), batch_id=1)
    with pytest.raises(RuntimeError, match="read-only"):
        old.overwrite(t.read())
    # and no orphan data files were written by the refused merge
    data = os.path.join(old.root, "data")
    before = t.at_version(t.manifest["seq"])  # still loadable, intact
    assert before.row_count() == 4
    assert t.manifest["seq"] == 2
    assert not [
        p
        for p in os.listdir(data)
        if p.startswith("snap-") and int(p.split("-")[1]) > 2
    ]


def test_at_version_missing_seq_raises(spark, tmp_root):
    t = _mk(spark, tmp_root)
    with pytest.raises(FileNotFoundError):
        t.at_version(99)


def test_changes_classifies_net_diff(spark, tmp_root):
    t = _mk(spark, tmp_root)
    t.merge(_changes(spark, BASE), batch_id=0)
    s1 = t.manifest["seq"]
    t.merge(_changes(spark, NEXT), batch_id=1)

    cdf = t.changes(s1)
    got = {(r["repo"], r["path"]): r["_change_type"] for r in cdf.collect()}
    assert got == {
        ("r1", "a.py"): "update_postimage",
        ("r3", "z.py"): "delete",
        ("r4", "n.py"): "insert",
    }
    # postimage carries NEW values; delete carries OLD values
    vals = {(r["repo"], r["path"]): r["content"] for r in cdf.collect()}
    assert vals[("r1", "a.py")] == "a1"
    assert vals[("r3", "z.py")] == "z0"
    # unchanged keys (r1/b.py, r2/a.py) emit nothing
    assert len(got) == 3


def test_changes_net_semantics_insert_then_delete(spark, tmp_root):
    t = _mk(spark, tmp_root)
    t.merge(_changes(spark, BASE), batch_id=0)
    s1 = t.manifest["seq"]
    t.merge(
        _changes(spark, [("r9", "tmp.py", "c1", "py", "x", "insert")]), batch_id=1
    )
    t.merge(
        _changes(spark, [("r9", "tmp.py", "c2", "py", None, "delete")]), batch_id=2
    )
    # net over [s1, live]: the transient key never surfaces
    assert t.changes(s1).count() == 0
    # but the intermediate window sees the insert
    mid = t.changes(s1, until_seq=s1 + 1)
    assert [
        (r["repo"], r["_change_type"]) for r in mid.collect()
    ] == [("r9", "insert")]


def test_changes_across_schema_evolution(spark, tmp_root):
    t = _mk(spark, tmp_root)
    t.merge(_changes(spark, BASE), batch_id=0)
    s1 = t.manifest["seq"]
    t.add_column("stars", "int")
    df = spark.createDataFrame(
        [("r1", "a.py", "c1", "py", "a1", 7, "update")],
        DDL.replace(", op string", ", stars int, op string"),
    )
    t.merge(df, batch_id=1)
    cdf = t.changes(s1)
    rows = {(r["repo"], r["path"]): r for r in cdf.collect()}
    # the old snapshot null-fills the added column; only the real update shows
    assert set(rows) == {("r1", "a.py")}
    assert rows[("r1", "a.py")]["stars"] == 7
    assert rows[("r1", "a.py")]["_change_type"] == "update_postimage"


def test_changes_over_mor_commits(spark, tmp_root):
    t = _mk(spark, tmp_root)
    t.merge(_changes(spark, BASE), batch_id=0, mode="mor")
    s1 = t.manifest["seq"]
    t.merge(_changes(spark, NEXT), batch_id=1, mode="mor")
    got = {
        (r["repo"], r["path"]): r["_change_type"]
        for r in t.changes(s1).collect()
    }
    assert got == {
        ("r1", "a.py"): "update_postimage",
        ("r3", "z.py"): "delete",
        ("r4", "n.py"): "insert",
    }


def test_changes_bad_window_raises(spark, tmp_root):
    t = _mk(spark, tmp_root)
    t.merge(_changes(spark, BASE), batch_id=0)
    with pytest.raises(ValueError):
        t.changes(5, until_seq=2)


def test_stream_compact_ratio_folds_deltas(spark, tmp_root):
    """MoR streaming with in-loop maintenance: after the availableNow pass
    every batch committed as deltas AND the ratio policy folded them."""
    from data_migration_validator_spark.cdc import (
        change_events,
        expected_final_state,
        write_events_batched,
    )
    from data_migration_validator_spark.validation.reconcile import hash_reconcile

    ev = change_events(spark, 4_000, seed=11, batch_size=1_000)
    edir = os.path.join(tmp_root, "ev")
    write_events_batched(ev, edir)
    t = _mk(spark, tmp_root, name="stream_t")
    run_stream_once(
        t,
        edir,
        os.path.join(tmp_root, "ckpt"),
        max_files_per_trigger=64,
        merge_mode="mor",
        compact_ratio=0.0,  # fold after every batch
    )
    assert t.manifest.get("deltas", []) == []
    rec = hash_reconcile(expected_final_state(ev), t.read(), ["repo", "path"])
    assert all(r["status"] == "MATCH" for r in rec.collect())


def test_changes_prunes_to_touched_buckets(spark, tmp_root):
    """The feed must scan only buckets whose manifest file lists differ
    between the snapshots — at steady state one small CDC batch means an
    O(touched buckets) diff, not an O(table) one."""
    t = _mk(spark, tmp_root, num_buckets=8)
    t.merge(_changes(spark, BASE), batch_id=0)
    since = t.manifest["seq"]
    total_files = len(t.manifest["files"])
    # touch exactly one key -> one bucket rewritten
    t.merge(
        _changes(spark, [("r1", "a.py", "c9", "py", "a9", "update")]),
        batch_id=1,
    )
    feed = t.changes(since)
    assert _rows(feed.select("repo", "path", "_change_type")) == [
        ("r1", "a.py", "update_postimage")
    ]
    scanned = set(feed.inputFiles())
    # both snapshots contribute only the touched bucket's file(s): strictly
    # fewer than one full side, let alone two
    assert 0 < len(scanned) < total_files
    # identical snapshots -> empty prune set -> zero files scanned
    empty = t.changes(t.manifest["seq"], t.manifest["seq"])
    assert empty.count() == 0 and len(empty.inputFiles()) == 0


def test_changes_full_fallback_across_rebucket(spark, tmp_root):
    """A partition-spec change inside the window makes bucket ids
    incomparable — the diff must fall back to the full join and stay
    correct."""
    t = _mk(spark, tmp_root, num_buckets=4)
    t.merge(_changes(spark, BASE), batch_id=0)
    since = t.manifest["seq"]
    t.rebucket(8)
    t.merge(_changes(spark, NEXT), batch_id=1)
    got = _rows(t.changes(since).select("repo", "path", "_change_type"))
    assert got == [
        ("r1", "a.py", "update_postimage"),
        ("r3", "z.py", "delete"),
        ("r4", "n.py", "insert"),
    ]
