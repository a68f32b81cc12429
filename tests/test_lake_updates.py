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


def test_update_where_accepts_column_and_rejects_garbage(spark, tmp_root):
    import pytest
    from pyspark.sql import functions as F

    t = _mk(spark, tmp_root)
    n = t.update_where("repo = 'r2'", {"lang": F.lit("python")})
    assert n == 1
    got = {(r["repo"], r["path"]): r["lang"] for r in t.read().collect()}
    assert got[("r2", "a")] == "python"
    with pytest.raises(TypeError):
        t.update_where("repo = 'r2'", {"lang": 42})


def test_update_delete_are_two_scan_ops(spark, tmp_root):
    # discovery (touched buckets + count, ONE action) + scoped rewrite:
    # exactly two reads of the table per op, never three.
    t = _mk(spark, tmp_root)
    calls = []
    orig = type(t).read

    def counting_read(self, *a, **kw):
        calls.append((a, kw))
        return orig(self, *a, **kw)

    type(t).read = counting_read
    try:
        calls.clear()
        assert t.update_where("lang = 'py'", {"content": "'P'"}) == 3
        assert len(calls) == 2
        calls.clear()
        assert t.delete_where("repo = 'r1'") == 2
        assert len(calls) == 2
    finally:
        type(t).read = orig


def test_predicate_bucket_pruning_on_bucket_column(spark, tmp_root):
    t = _mk(spark, tmp_root)
    # repo is the bucket column: equality predicate prunes the discovery scan
    pruned = t._buckets_from_predicate("repo = 'r1' AND lang = 'py'")
    assert pruned is not None and len(pruned) == 1
    full = t.read(buckets=pruned, with_bucket=True)
    assert {r["repo"] for r in full.collect()} >= {"r1"}
    # IN-list prunes to <= 2 buckets; OR disables pruning
    assert t._buckets_from_predicate("repo IN ('r1', 'r2')") is not None
    assert t._buckets_from_predicate("repo = 'r1' OR lang = 'py'") is None
    assert t._buckets_from_predicate("lang = 'py'") is None
    # expression-tree walk: shapes the old regex missed or had to bail on
    assert t._buckets_from_predicate("`repo` = 'r1'") == pruned  # backticks
    assert t._buckets_from_predicate("'r1' = repo") == pruned  # reversed
    assert t._buckets_from_predicate("(repo = 'r1') AND (lang = 'py')") == pruned
    assert t._buckets_from_predicate(
        "path BETWEEN 'a' AND 'z' AND repo = 'r1'"
    ) == pruned  # non-pinning conjunct ignored
    # a negated equality must NOT prune to the literal's bucket
    assert t._buckets_from_predicate("NOT repo = 'r1'") is None
    assert t._buckets_from_predicate("repo != 'r1'") is None
    # ...but a NOT on ANOTHER conjunct doesn't block pruning on this one
    assert t._buckets_from_predicate("NOT lang = 'py' AND repo = 'r1'") == pruned
    # garbage predicates analyze to no-pruning, not an error
    assert t._buckets_from_predicate("this is not sql") is None
    # pruned discovery gives the same answer as unpruned
    assert t.delete_where("repo = 'r1' AND path = 'a'") == 1
    assert {(r["repo"], r["path"]) for r in t.read().collect()} == {
        ("r1", "b"), ("r2", "a"), ("r3", "x")
    }


def test_expire_snapshots_vacuums_dead_files(spark, tmp_root):
    import glob as g

    t = _mk(spark, tmp_root)
    # several merges so COW leaves superseded files behind
    for i in range(3):
        ch = spark.createDataFrame(
            [("r1", "a", f"c{i+5}", "py", f"v{i+5}", "update")],
            "repo string, path string, commit string, lang string, content string, op string",
        )
        t.merge(ch, batch_id=100 + i)
    before = set(g.glob(os.path.join(t.root, "data", "**", "*.parquet"), recursive=True))
    live = {os.path.join(t.root, f["path"]) for f in t.manifest["files"]}
    assert live < before  # dead files exist pre-vacuum

    expected = sorted(tuple(r) for r in t.read().collect())
    stats = t.expire_snapshots(keep_last=1)
    assert stats["files_removed"] == len(before) - len(live)
    assert stats["bytes_reclaimed"] > 0
    after = set(g.glob(os.path.join(t.root, "data", "**", "*.parquet"), recursive=True))
    assert after == live  # on-disk == live manifest files
    # reads still correct after vacuum, including from a fresh load
    assert sorted(tuple(r) for r in t.read().collect()) == expected
    t2 = LakeTable.load(spark, t.root)
    assert sorted(tuple(r) for r in t2.read().collect()) == expected


def test_expire_snapshots_keeps_time_travel_window(spark, tmp_root):
    t = _mk(spark, tmp_root)
    ch = spark.createDataFrame(
        [("r1", "a", "c9", "py", "v9", "update")],
        "repo string, path string, commit string, lang string, content string, op string",
    )
    t.merge(ch, batch_id=200)
    n_manifests = len(t.history())
    stats = t.expire_snapshots(keep_last=n_manifests)
    assert stats["manifests_removed"] == 0 and stats["files_removed"] == 0


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


def test_expire_snapshots_grace_period_protects_recent_manifests(spark, tmp_root):
    """min_age_s: an expired-but-young manifest (and its files) survives the
    vacuum cycle, so a concurrent reader holding it keeps its scan valid;
    with the grace elapsed, a second vacuum reclaims it."""
    import glob as g

    t = _mk(spark, tmp_root)
    for i in range(3):
        ch = spark.createDataFrame(
            [("r1", "a", f"g{i}", "py", f"w{i}", "update")],
            "repo string, path string, commit string, lang string, content string, op string",
        )
        t.merge(ch, batch_id=300 + i)
    n_before = len(t.history())
    all_files = set(g.glob(os.path.join(t.root, "data", "**", "*.parquet"), recursive=True))

    # every manifest is seconds old → all protected by a 1h grace
    stats = t.expire_snapshots(keep_last=1, min_age_s=3600)
    assert stats["manifests_removed"] == 0 and stats["files_removed"] == 0
    assert len(t.history()) == n_before
    still = set(g.glob(os.path.join(t.root, "data", "**", "*.parquet"), recursive=True))
    assert still == all_files

    # age the old manifests past the grace → next cycle reclaims
    mdir = os.path.join(t.root, "_manifest")
    for p in sorted(g.glob(os.path.join(mdir, "v*.json")))[:-1]:
        os.utime(p, (1, 1))
    stats2 = t.expire_snapshots(keep_last=1, min_age_s=3600)
    assert stats2["manifests_removed"] == n_before - 1
    assert stats2["files_removed"] > 0
    live = {os.path.join(t.root, f["path"]) for f in t.manifest["files"]}
    after = set(g.glob(os.path.join(t.root, "data", "**", "*.parquet"), recursive=True))
    assert after == live
