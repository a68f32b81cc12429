"""Replay-equivalence: incremental batch MERGE replay must reproduce the
batch oracle's final state exactly (sha256 row digests, anti-join both ways
empty) — SURVEY.md §5 golden strategy."""

import os

from pyspark.sql import functions as F

from data_migration_validator_spark.cdc import (
    apply_batch,
    change_events,
    dedup_last_writer_wins,
    expected_final_state,
    replay,
    write_events_batched,
)
from data_migration_validator_spark.cdc.apply import make_lineage_table
from data_migration_validator_spark.lake import LakeTable
from data_migration_validator_spark.validation import reconcile_counts

SCHEMA = [
    ("repo", "string"),
    ("path", "string"),
    ("commit", "string"),
    ("lang", "string"),
    ("content", "string"),
]


def _new_table(spark, root, name="t", num_buckets=8):
    return LakeTable.create(
        spark, os.path.join(root, name), SCHEMA, key_cols=["repo", "path"],
        num_buckets=num_buckets,
    )


def _assert_state_equal(engine_df, oracle_df):
    counts = reconcile_counts(
        oracle_df, engine_df, key_cols=["repo", "path"]
    ).collect()[0]
    assert counts["mismatches"] == 0, f"mismatched rows: {counts}"
    assert counts["src_extras"] == 0, f"rows missing in engine: {counts}"
    assert counts["tgt_extras"] == 0, f"extra rows in engine: {counts}"
    assert counts["matches"] == oracle_df.count()


def test_generator_is_deterministic(spark):
    a = change_events(spark, 500, seed=7).collect()
    b = change_events(spark, 500, seed=7).collect()
    assert a == b
    c = change_events(spark, 500, seed=8)
    assert c.count() == 500


def test_dedup_last_writer_wins(spark):
    ev = spark.createDataFrame(
        [
            (1, "insert", "r", "p", "c1", "py", "v1"),
            (5, "update", "r", "p", "c5", "py", "v5"),
            (3, "update", "r", "p", "c3", "py", "v3"),
            (2, "insert", "r", "q", "c2", "py", "w2"),
        ],
        "event_seq long, op string, repo string, path string, commit string, lang string, content string",
    )
    out = {(r["repo"], r["path"]): (r["event_seq"], r["content"])
           for r in dedup_last_writer_wins(ev).collect()}
    assert out == {("r", "p"): (5, "v5"), ("r", "q"): (2, "w2")}


def test_dedup_salted_two_phase_equals_single_phase(spark):
    """Skew layer 2 (explicit salt) must be result-identical to the
    single-phase default — on a skewed stream (one hot repo)."""
    ev = change_events(spark, 3_000, n_repos=5, paths_per_repo=10, seed=3,
                       skew=4.0).where("op <> 'schema'").select(
        "event_seq", "op", "repo", "path", "commit", "lang", "content")
    single = dedup_last_writer_wins(ev, salt_buckets=1)
    salted = dedup_last_writer_wins(ev, salt_buckets=16)
    assert sorted(map(tuple, single.collect())) == sorted(map(tuple, salted.collect()))


def test_single_batch_apply_matches_oracle(spark, tmp_root):
    events = change_events(spark, 2_000, n_repos=20, paths_per_repo=30, seed=11)
    t = _new_table(spark, tmp_root)
    apply_batch(t, events, batch_id=0)
    _assert_state_equal(t.read(), expected_final_state(events))


def test_multi_batch_replay_matches_oracle(spark, tmp_root):
    events = change_events(
        spark, 5_000, n_repos=25, paths_per_repo=40, seed=13, batch_size=1_000
    )
    events_dir = os.path.join(tmp_root, "events")
    write_events_batched(events, events_dir)

    t = _new_table(spark, tmp_root)
    lineage = make_lineage_table(spark, os.path.join(tmp_root, "lineage"))
    stats = replay(t, events_dir, lineage=lineage)
    assert stats["batches_applied"] == 5
    _assert_state_equal(t.read(), expected_final_state(events))

    # lineage: every batch covered, offsets contiguous across batches
    ldf = lineage.read()
    per_batch = (
        ldf.groupBy("batch_id")
        .agg(F.min("first_event_seq").alias("lo"), F.max("last_event_seq").alias("hi"))
        .orderBy("batch_id")
        .collect()
    )
    assert [r["batch_id"] for r in per_batch] == [0, 1, 2, 3, 4]
    for r in per_batch:
        assert r["lo"] >= r["batch_id"] * 1000 and r["hi"] < (r["batch_id"] + 1) * 1000


def test_replay_is_idempotent_on_redelivery(spark, tmp_root):
    events = change_events(spark, 3_000, seed=17, batch_size=1_000)
    events_dir = os.path.join(tmp_root, "events")
    write_events_batched(events, events_dir)

    t = _new_table(spark, tmp_root)
    replay(t, events_dir)
    before = sorted(tuple(r) for r in t.read().collect())
    seq_before = t.manifest["seq"]

    # redeliver every batch verbatim (duplicated batch_hint groups, F3)
    stats = replay(t, events_dir)
    assert stats["batches_applied"] == 0
    assert stats["batches_skipped"] == 3
    assert t.manifest["seq"] == seq_before
    assert sorted(tuple(r) for r in t.read().collect()) == before


def test_resume_after_partial_run(spark, tmp_root):
    """Kill-and-resume: applying a prefix then replaying the whole stream
    yields the same state as one clean run."""
    events = change_events(spark, 4_000, seed=19, batch_size=1_000)
    events_dir = os.path.join(tmp_root, "events")
    write_events_batched(events, events_dir)

    t = _new_table(spark, tmp_root)
    replay(t, events_dir, batch_ids=[0, 1])  # "crash" after 2 batches
    stats = replay(t, events_dir)  # restart replays all; 0-1 skipped
    assert stats["batches_skipped"] == 2
    assert stats["batches_applied"] == 2
    _assert_state_equal(t.read(), expected_final_state(events))


def test_pk_violation_dedup_is_deterministic(spark, tmp_root):
    """Two events with identical (repo, path, event_seq): the engine picks a
    deterministic winner (max commit) — scenario F3 pk_violation."""
    ev = spark.createDataFrame(
        [
            (1, "insert", "r", "p", "aaaa", "py", "v-a"),
            (1, "insert", "r", "p", "zzzz", "py", "v-z"),
        ],
        "event_seq long, op string, repo string, path string, commit string, lang string, content string",
    )
    for _ in range(3):
        out = dedup_last_writer_wins(ev).collect()
        assert len(out) == 1 and out[0]["content"] == "v-z"


def test_content_sha256_invariant_vs_oracle(spark, tmp_root):
    """The input_hint per-row invariant: content sha256 equality, computed
    via the Arrow pandas UDF path."""
    from data_migration_validator_spark.functions import content_sha256

    events = change_events(spark, 1_500, seed=23)
    t = _new_table(spark, tmp_root)
    apply_batch(t, events, batch_id=0)

    eng = t.read().select("repo", "path", content_sha256("content").alias("h"))
    ora = expected_final_state(events).select(
        "repo", "path", content_sha256("content").alias("h")
    )
    diff = eng.join(ora, ["repo", "path", "h"], "full_outer").filter(
        F.col("h").isNull()
    )
    assert eng.exceptAll(ora).count() == 0
    assert ora.exceptAll(eng).count() == 0


def test_monotone_frontier_replay_prunes_and_matches_oracle(spark, tmp_root):
    """key_locality gives the autoincrement-PK CDC shape (monotone key
    frontier, updates skewed recent; padded repos so lexical == numeric
    order).  The replay must (a) keep old files untouched via the MERGE
    file prune, (b) still match the last-writer-wins oracle exactly, and
    (c) produce the same state as a prune-off replay of the SAME events."""
    ev = change_events(
        spark, 20_000, n_repos=100, seed=7, batch_size=5_000, key_locality=800
    )
    # deterministic like the uniform shape
    a = ev.orderBy("event_seq").limit(5).collect()
    b = change_events(
        spark, 20_000, n_repos=100, seed=7, batch_size=5_000, key_locality=800
    ).orderBy("event_seq").limit(5).collect()
    assert a == b

    write_events_batched(ev, os.path.join(tmp_root, "events"))
    t_on = _new_table(spark, tmp_root, "on")
    st = replay(t_on, os.path.join(tmp_root, "events"))
    assert st["files_kept"] > 0  # old frontier files survived untouched
    _assert_state_equal(t_on.read(), expected_final_state(ev))

    t_off = LakeTable.create(
        spark, os.path.join(tmp_root, "off"), SCHEMA,
        key_cols=["repo", "path"], num_buckets=8,
        properties={"write.merge.prune_files": "false"},
    )
    st_off = replay(t_off, os.path.join(tmp_root, "events"))
    assert st_off["files_kept"] == 0
    assert st["files_rewritten"] < st_off["files_rewritten"]
    assert (
        t_on.read().exceptAll(t_off.read()).count() == 0
        and t_off.read().exceptAll(t_on.read()).count() == 0
    )


def test_key_locality_zero_rejected(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="key_locality"):
        change_events(spark, 100, key_locality=0)
