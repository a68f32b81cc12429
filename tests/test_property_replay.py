"""Property-based invariants (hypothesis): under randomized generator knobs
— seed, skew, delete ratio, salting — the engine's replay must equal the
batch oracle, and every last-writer-wins dedup form must agree."""

import os
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_migration_validator_spark.cdc import (
    change_events,
    expected_final_state,
    write_events_batched,
)
from data_migration_validator_spark.cdc.apply import (
    dedup_bucket_aligned,
    dedup_last_writer_wins,
)
from data_migration_validator_spark.cdc.replay import replay
from data_migration_validator_spark.lake import LakeTable
from data_migration_validator_spark.validation import reconcile_counts

SCHEMA = [
    ("repo", "string"),
    ("path", "string"),
    ("commit", "string"),
    ("lang", "string"),
    ("content", "string"),
]


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 10_000),
    skew=st.floats(1.0, 3.0),
    delete_ratio=st.floats(0.0, 0.4),
    salt=st.sampled_from([1, 4]),
    merge_mode=st.sampled_from(["cow", "mor"]),
)
def test_replay_equals_oracle_under_random_knobs(
    spark, seed, skew, delete_ratio, salt, merge_mode
):
    ev = change_events(
        spark, 400, n_repos=10, paths_per_repo=20, seed=seed,
        skew=skew, delete_ratio=delete_ratio, batch_size=200,
    )
    with tempfile.TemporaryDirectory() as tmp:
        write_events_batched(ev, os.path.join(tmp, "events"), files_per_batch=4)
        table = LakeTable.create(
            spark, os.path.join(tmp, "t"), SCHEMA,
            key_cols=["repo", "path"], num_buckets=4,
        )
        replay(
            table, os.path.join(tmp, "events"),
            salt_buckets=salt, merge_mode=merge_mode,
        )
        counts = reconcile_counts(
            expected_final_state(ev), table.read(), key_cols=["repo", "path"]
        ).collect()[0]
        assert counts["mismatches"] == 0, (seed, skew, delete_ratio, counts)
        assert counts["src_extras"] == 0 and counts["tgt_extras"] == 0, counts


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 10_000), skew=st.floats(1.0, 3.0))
def test_dedup_forms_agree(spark, seed, skew):
    """Single-phase hash-agg, salted two-phase, and the bucket-aligned
    window form must produce the identical winner set."""
    ev = change_events(
        spark, 500, n_repos=8, paths_per_repo=15, seed=seed, skew=skew,
    ).select("event_seq", "op", "repo", "path", "commit", "lang", "content")

    def key_set(df):
        return {
            (r["repo"], r["path"], r["event_seq"])
            for r in df.select("repo", "path", "event_seq").collect()
        }

    plain = key_set(dedup_last_writer_wins(ev, ["repo", "path"]))
    salted = key_set(dedup_last_writer_wins(ev, ["repo", "path"], salt_buckets=4))
    bucket_col = F.pmod(F.xxhash64("repo"), F.lit(4)).cast("int")
    aligned = key_set(
        dedup_bucket_aligned(ev, ["repo", "path"], bucket_col).drop("__bucket")
    )
    assert plain == salted == aligned


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 10_000),
    bad_op_mod=st.sampled_from([43, 97]),
    null_key_mod=st.sampled_from([59, 101]),
    merge_mode=st.sampled_from(["cow", "mor"]),
)
def test_quarantined_replay_equals_clean_oracle(
    spark, seed, bad_op_mod, null_key_mod, merge_mode
):
    """Randomly corrupted streams (unknown ops, null keys at arbitrary
    residues): the quarantined replay's final state must equal the oracle
    over ONLY the clean events, and the dead-letter table must hold exactly
    the corrupted ones."""
    from data_migration_validator_spark.cdc import (
        classify_events,
        make_quarantine_table,
    )

    ev = change_events(
        spark, 400, n_repos=10, paths_per_repo=20, seed=seed, batch_size=200,
    )
    bad = ev.withColumn(
        "op",
        F.when(F.col("event_seq") % bad_op_mod == 0, F.lit("nonsense"))
        .otherwise(F.col("op")),
    ).withColumn(
        "path",
        F.when(F.col("event_seq") % null_key_mod == 1, F.lit(None).cast("string"))
        .otherwise(F.col("path")),
    )
    with tempfile.TemporaryDirectory() as tmp:
        write_events_batched(bad, os.path.join(tmp, "events"), files_per_batch=4)
        table = LakeTable.create(
            spark, os.path.join(tmp, "t"), SCHEMA,
            key_cols=["repo", "path"], num_buckets=4,
        )
        dlq = make_quarantine_table(spark, os.path.join(tmp, "dlq"))
        replay(
            table, os.path.join(tmp, "events"),
            merge_mode=merge_mode, quarantine=dlq,
        )
        clean = classify_events(bad).filter(
            F.col("dlq_reason").isNull()
        ).drop("dlq_reason")
        counts = reconcile_counts(
            expected_final_state(clean), table.read(), key_cols=["repo", "path"]
        ).collect()[0]
        assert counts["mismatches"] == 0, counts
        assert counts["src_extras"] == 0 and counts["tgt_extras"] == 0, counts
        expected_bad = (
            classify_events(bad).filter(F.col("dlq_reason").isNotNull()).count()
        )
        assert dlq.row_count() == expected_bad
