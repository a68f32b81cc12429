"""Ops-plane streaming metrics: per-trigger progress rows captured by the
query listener and persisted to a lake table."""

import os

from pyspark.sql import functions as F

from data_migration_validator_spark.cdc import change_events, write_events_batched
from data_migration_validator_spark.lake import LakeTable
from data_migration_validator_spark.streaming.metrics import make_progress_table
from data_migration_validator_spark.streaming.stream import run_stream_once

SCHEMA = [
    ("repo", "string"),
    ("path", "string"),
    ("commit", "string"),
    ("lang", "string"),
    ("content", "string"),
]


def test_progress_metrics_captured(spark, tmp_root):
    n = 2_000
    ev = change_events(spark, n, n_repos=10, seed=13, batch_size=1_000)
    events_dir = os.path.join(tmp_root, "events")
    write_events_batched(ev, events_dir)
    table = LakeTable.create(
        spark, os.path.join(tmp_root, "t"), SCHEMA,
        key_cols=["repo", "path"], num_buckets=4,
    )
    progress = make_progress_table(spark, os.path.join(tmp_root, "progress"))
    run_stream_once(
        table, events_dir, os.path.join(tmp_root, "ckpt"),
        max_files_per_trigger=64, progress=progress,
    )
    rows = progress.read().collect()
    assert rows, "no trigger progress captured"
    agg = progress.read().agg(
        F.sum("num_input_rows").alias("total"),
        F.min("trigger_ms").alias("min_ms"),
    ).collect()[0]
    # numInputRows counts source rows READ: the sink's fused-stats +
    # write actions each scan the batch once, so the trigger total is an
    # exact small multiple of the event count (scan amplification; see
    # streaming/metrics.py docstring)
    assert agg["total"] % n == 0 and 1 <= agg["total"] // n <= 4
    assert agg["min_ms"] >= 0
    assert all(r["batch_id"] >= 0 for r in rows)
