"""Row-level UPDATE/DELETE sinks (S14), DESCRIBE DETAIL (A7), and
pending-batch discovery (J10 analog)."""

import os

from data_migration_validator_spark.cdc import (
    change_events,
    write_events_batched,
)
from data_migration_validator_spark.cdc.replay import pending_batches, replay
from data_migration_validator_spark.lake import LakeTable

SCHEMA = [
    ("repo", "string"),
    ("path", "string"),
    ("commit", "string"),
    ("lang", "string"),
    ("content", "string"),
]


def _mk(spark, root):
    t = LakeTable.create(
        spark, os.path.join(root, "t"), SCHEMA, key_cols=["repo", "path"],
        num_buckets=4,
    )
    base = spark.createDataFrame(
        [("r1", "a", "c1", "py", "v1"), ("r1", "b", "c1", "py", "v1"),
         ("r2", "a", "c1", "go", "v2"), ("r3", "x", "c2", "py", "v3")],
        "repo string, path string, commit string, lang string, content string",
    )
    t.overwrite(base)
    return t


def test_update_where(spark, tmp_root):
    t = _mk(spark, tmp_root)
    n = t.update_where("lang = 'py'", {"content": "'PATCHED'"})
    assert n == 3
    got = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    assert got[("r1", "a")] == "PATCHED" and got[("r2", "a")] == "v2"
    # no matching rows → no-op, no new snapshot
    seq = t.manifest["seq"]
    assert t.update_where("lang = 'rs'", {"content": "'X'"}) == 0
    assert t.manifest["seq"] == seq


def test_delete_where(spark, tmp_root):
    t = _mk(spark, tmp_root)
    n = t.delete_where("repo = 'r1'")
    assert n == 2
    assert {r["repo"] for r in t.read().collect()} == {"r2", "r3"}


def test_detail(spark, tmp_root):
    t = _mk(spark, tmp_root)
    d = t.detail()
    assert d["num_rows"] == 4
    assert d["num_files"] >= 1
    assert d["size_in_bytes"] > 0


def test_pending_batches(spark, tmp_root):
    ev = change_events(spark, 1200, n_repos=10, seed=3, batch_size=300)
    events_dir = os.path.join(tmp_root, "events")
    write_events_batched(ev, events_dir)
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "t2"), SCHEMA, key_cols=["repo", "path"],
        num_buckets=4,
    )
    assert pending_batches(t, events_dir) == [0, 1, 2, 3]
    replay(t, events_dir, batch_ids=[0, 1])
    assert pending_batches(t, events_dir) == [2, 3]
    replay(t, events_dir)
    assert pending_batches(t, events_dir) == []
