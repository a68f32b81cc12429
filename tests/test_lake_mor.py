"""Merge-on-read: delta commits, read-time resolution, compaction,
COW-equivalence, schema evolution across deltas, vacuum liveness.

MOR is the high-rate CDC ingest mode (north rule: 10^10-event replay):
each merge lands O(batch) delta bytes instead of rewriting every touched
bucket; readers fold deltas in (latest delta seq wins, tombstones drop);
``compact`` folds them back into base files.  Mirrors the Iceberg v2
position on the same trade-off — the reference's MERGE sink
(conf/setup_validation_mapping.py:8-67) is the COW analog.
"""

import os

from pyspark.sql import functions as F

from data_migration_validator_spark.cdc import (
    change_events,
    expected_final_state,
    replay,
    write_events_batched,
)
from data_migration_validator_spark.lake import LakeTable
from data_migration_validator_spark.validation.reconcile import hash_reconcile

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


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _changes(spark, rows):
    return spark.createDataFrame(rows, DDL)


BASE = [
    ("r1", "a.py", "c0", "py", "a0", "insert"),
    ("r1", "b.py", "c0", "py", "b0", "insert"),
    ("r2", "a.py", "c0", "py", "a0", "insert"),
    ("r3", "z.py", "c0", "py", "z0", "insert"),
]


def test_mor_merge_and_read_resolution(spark, tmp_root):
    t = _mk(spark, tmp_root)
    s0 = t.merge(_changes(spark, BASE), batch_id=0, mode="mor")
    assert s0["mode"] == "mor" and s0["rows_upserted"] == 4
    assert t.manifest["deltas"], "delta entries must land in the manifest"
    assert t.manifest["files"] == [], "MOR merge must not write base files"

    # second delta: update one key, delete another, insert a new one
    s1 = t.merge(
        _changes(
            spark,
            [
                ("r1", "a.py", "c1", "py", "a1", "update"),
                ("r2", "a.py", "c1", "py", None, "delete"),
                ("r4", "n.py", "c1", "py", "n0", "insert"),
            ],
        ),
        batch_id=1,
        mode="mor",
    )
    assert s1["rows_upserted"] == 2 and s1["rows_delete_requested"] == 1

    got = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    assert got[("r1", "a.py")] == "a1"  # later delta wins
    assert ("r2", "a.py") not in got  # tombstone drops the row
    assert got[("r4", "n.py")] == "n0"
    assert got[("r1", "b.py")] == "b0"
    assert t.row_count() == 4  # exact (resolved) count under live deltas

    # delete of an absent key is a no-op on the resolved view
    t.merge(
        _changes(spark, [("rX", "no.py", "c9", "py", None, "delete")]),
        batch_id=2,
        mode="mor",
    )
    assert t.row_count() == 4


def test_mor_equals_cow_after_same_batches(spark, tmp_root):
    """The resolved MOR view must be row-identical to a COW table given the
    same merge sequence — mode changes the layout, never the semantics."""
    cow = _mk(spark, tmp_root, "cow")
    mor = _mk(spark, tmp_root, "mor")
    batches = [
        BASE,
        [
            ("r1", "a.py", "c1", "py", "a1", "update"),
            ("r3", "z.py", "c1", "py", None, "delete"),
        ],
        [
            ("r3", "z.py", "c2", "py", "z2", "insert"),  # re-insert after delete
            ("r1", "b.py", "c2", "py", None, "delete"),
        ],
    ]
    for i, b in enumerate(batches):
        cow.merge(_changes(spark, b), batch_id=i, mode="cow")
        mor.merge(_changes(spark, b), batch_id=i, mode="mor")
    assert _rows(mor.read()) == _rows(cow.read())
    # bucket pruning on the resolved view stays correct
    for b in range(4):
        assert _rows(mor.read(buckets=[b])) == _rows(cow.read(buckets=[b]))


def test_mor_compact_folds_deltas(spark, tmp_root):
    t = _mk(spark, tmp_root)
    t.merge(_changes(spark, BASE), batch_id=0, mode="mor")
    t.merge(
        _changes(
            spark,
            [
                ("r1", "a.py", "c1", "py", "a1", "update"),
                ("r2", "a.py", "c1", "py", None, "delete"),
            ],
        ),
        batch_id=1,
        mode="mor",
    )
    before = _rows(t.read())
    assert t.delta_detail()["num_delta_files"] > 0
    res = t.compact()
    assert not res["skipped"] and res["rows"] == 3
    assert t.manifest["deltas"] == []
    assert _rows(t.read()) == before  # compaction is invisible to readers
    assert t.row_count() == 3  # metadata-only again
    assert t.delta_detail()["num_delta_files"] == 0
    # exactly-once markers survive compaction
    assert t.has_batch(0) and t.has_batch(1)


def test_mor_cow_merge_on_delta_table_clears_folded_deltas(spark, tmp_root):
    """A COW merge reads the MOR-resolved state, so the touched buckets'
    deltas must leave the manifest with the old files."""
    t = _mk(spark, tmp_root)
    t.merge(_changes(spark, BASE), batch_id=0, mode="mor")
    t.merge(
        _changes(spark, [("r1", "a.py", "c1", "py", "a1", "update")]),
        batch_id=1,
        mode="cow",
    )
    got = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    assert got[("r1", "a.py")] == "a1" and len(got) == 4
    touched = set(t.manifest["bucket_rows"])  # buckets the COW rewrite wrote
    assert all(str(e["bucket"]) not in touched for e in t.manifest.get("deltas", []))


def test_mor_update_delete_where_resolve_and_clear(spark, tmp_root):
    t = _mk(spark, tmp_root)
    t.merge(_changes(spark, BASE), batch_id=0, mode="mor")
    t.merge(
        _changes(spark, [("r1", "a.py", "c1", "py", "a1", "update")]),
        batch_id=1,
        mode="mor",
    )
    n = t.update_where("repo = 'r1'", {"lang": "'python'"})
    assert n == 2
    got = {(r["repo"], r["path"]): (r["lang"], r["content"]) for r in t.read().collect()}
    assert got[("r1", "a.py")] == ("python", "a1")  # delta applied, then update
    assert got[("r1", "b.py")] == ("python", "b0")
    assert t.delete_where("repo = 'r3'") == 1
    assert t.row_count() == 3


def test_mor_schema_evolution_across_deltas(spark, tmp_root):
    t = _mk(spark, tmp_root)
    t.merge(_changes(spark, BASE), batch_id=0, mode="mor")
    t.rename_column("lang", "language")
    t.add_column("stars", "int")
    upd = spark.createDataFrame(
        [("r1", "a.py", "c1", "go", "a1", 5, "update")],
        "repo string, path string, commit string, language string, "
        "content string, stars int, op string",
    )
    t.merge(upd, batch_id=1, mode="mor")
    rows = {(r["repo"], r["path"]): r for r in t.read().collect()}
    assert rows[("r1", "a.py")]["language"] == "go"
    assert rows[("r1", "a.py")]["stars"] == 5
    assert rows[("r1", "b.py")]["language"] == "py"  # old delta projected by id
    assert rows[("r1", "b.py")]["stars"] is None
    t.compact()
    assert {(r["repo"], r["path"]): r["language"] for r in t.read().collect()}[
        ("r1", "a.py")
    ] == "go"


def test_mor_vacuum_keeps_live_deltas(spark, tmp_root):
    t = _mk(spark, tmp_root)
    t.merge(_changes(spark, BASE), batch_id=0, mode="mor")
    t.merge(
        _changes(spark, [("r1", "a.py", "c1", "py", "a1", "update")]),
        batch_id=1,
        mode="mor",
    )
    before = _rows(t.read())
    t.expire_snapshots(keep_last=1)
    assert _rows(t.read()) == before  # live delta files survive vacuum
    t.compact()
    res = t.expire_snapshots(keep_last=1)
    assert res["files_removed"] > 0  # folded deltas are now reclaimable
    assert _rows(t.read()) == before


def test_mor_exactly_once_and_empty_batch(spark, tmp_root):
    t = _mk(spark, tmp_root)
    t.merge(_changes(spark, BASE), batch_id=7, mode="mor")
    again = t.merge(_changes(spark, BASE), batch_id=7, mode="mor")
    assert again["skipped"] is True
    empty = t.merge(_changes(spark, []), batch_id=8, mode="mor")
    assert empty["rows_upserted"] == 0 and empty["touched_buckets"] == []
    assert t.has_batch(8)


def test_mor_replay_end_to_end_with_compaction(spark, tmp_root):
    """North-rule pipeline in MOR mode: batched replay → digest reconcile
    all-MATCH vs the batch oracle, mid-replay compaction included."""
    ev = change_events(spark, 8_000, seed=11, batch_size=2_000)
    events_dir = os.path.join(tmp_root, "events")
    write_events_batched(ev, events_dir)
    t = LakeTable.create(
        spark,
        os.path.join(tmp_root, "t"),
        SCHEMA,
        key_cols=["repo", "path"],
        num_buckets=8,
        properties={"write.merge.mode": "mor"},  # table-level default
    )
    stats = replay(t, events_dir, compact_every=2)
    assert stats["batches_applied"] == 4
    rec = hash_reconcile(
        t.read(),
        expected_final_state(ev),
        ["repo", "path"],
        ["commit", "lang", "content"],
    )
    assert rec.filter(F.col("status") != "MATCH").count() == 0
    # 4 batches, compact every 2 → deltas from batches 3-4 were folded at 4
    assert t.delta_detail()["num_delta_files"] == 0
    # redelivery after compaction: still exactly-once
    again = replay(t, events_dir)
    assert again["batches_applied"] == 0 and again["batches_skipped"] == 4


def test_mor_maybe_compact_policy(spark, tmp_root):
    """maybe_compact folds only buckets past the delta-bytes ratio —
    metadata-only decision, no scan of under-threshold buckets."""
    t = _mk(spark, tmp_root)
    t.merge(_changes(spark, BASE), batch_id=0, mode="mor")
    # no base files at all → every delta-bearing bucket is due immediately
    res = t.maybe_compact(max_delta_ratio=0.3)
    assert not res["skipped"] and t.manifest["deltas"] == []
    rows_before = t.row_count()
    # small delta on a big base → under threshold → untouched
    t.merge(
        _changes(spark, [("r1", "a.py", "c1", "py", "a1", "update")]),
        batch_id=1,
        mode="mor",
    )
    res2 = t.maybe_compact(max_delta_ratio=10.0)  # generous ratio: not due
    assert res2["skipped"] and t.manifest["deltas"]
    res3 = t.maybe_compact(max_delta_ratio=0.0)  # any delta is due
    assert res3["compacted_buckets"] and t.manifest["deltas"] == []
    assert t.row_count() == rows_before


def test_mor_count_deletes_exact(spark, tmp_root):
    t = _mk(spark, tmp_root)
    t.merge(_changes(spark, BASE), batch_id=0, mode="mor")
    s = t.merge(
        _changes(
            spark,
            [
                ("r1", "a.py", "c1", "py", None, "delete"),  # present
                ("rX", "no.py", "c1", "py", None, "delete"),  # absent
            ],
        ),
        batch_id=1,
        mode="mor",
        count_deletes=True,
    )
    assert s["rows_delete_requested"] == 2 and s["rows_deleted"] == 1
