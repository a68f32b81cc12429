"""Event-time streaming: watermarked windowed metrics (append-mode window
finalization + late-data drop) and the applyInPandasWithState ordering gate
(row-level redelivery protection across checkpoint restarts)."""

import os

from pyspark.sql import functions as F

from data_migration_validator_spark.cdc import change_events
from data_migration_validator_spark.streaming.stream import EVENT_STREAM_SCHEMA
from data_migration_validator_spark.streaming.windowed import (
    stateful_ordering_gate,
    windowed_event_metrics,
    with_event_time,
)


def _run_once(stream_df, ckpt, out_dir, output_mode, timeout_s=120):
    """One availableNow pass, emitted rows appended to a parquet dir via
    foreachBatch (the memory sink cannot recover from a checkpoint; this
    sink restarts).  Returns the CUMULATIVE rows emitted so far."""
    spark = stream_df.sparkSession

    def sink(bdf, _bid):
        bdf.write.mode("append").parquet(out_dir)

    q = (
        stream_df.writeStream.outputMode(output_mode)
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
    if not os.path.exists(out_dir):
        return []
    return spark.read.parquet(out_dir).collect()


def _read_events_stream(spark, events_dir, max_files_per_trigger=2):
    return (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )


def _stamp_mtimes(events_dir, t0):
    """Strictly increasing mtimes in path order: the file source orders by
    modification time only, and one bulk write gives every file the same
    stamp, leaving arrival order nondeterministic."""
    files = sorted(
        f for f in os.listdir(events_dir) if f.startswith("part-")
    )
    for i, name in enumerate(files):
        ts = t0 + i
        os.utime(os.path.join(events_dir, name), (ts, ts))
    return t0 + len(files)


def _sentinel(spark, event_seq):
    """One far-future event that pushes the watermark past every real
    window (event_time derives from event_seq)."""
    return spark.createDataFrame(
        [(event_seq, "update", "org0/repo0", "src/flush", "f" * 40, "py", "x", None, 0)],
        schema=EVENT_STREAM_SCHEMA,
    )


def test_windowed_metrics_finalize_and_match_batch_oracle(spark, tmp_root):
    events_dir = os.path.join(tmp_root, "events")
    ckpt = os.path.join(tmp_root, "ckpt")
    out = os.path.join(tmp_root, "out")
    ev = change_events(spark, 3000, n_repos=20, seed=11, batch_size=1000)
    ev.repartition(4).write.mode("append").parquet(events_dir)

    def windowed(stream):
        return windowed_event_metrics(
            with_event_time(stream, events_per_sec=100),
            window_duration="10 seconds",
            watermark_delay="5 seconds",
        )

    # pass 1: real data — windows whose end precedes the final watermark emit
    _run_once(windowed(_read_events_stream(spark, events_dir)), ckpt, out, "append")

    # pass 2: far-future sentinel advances the watermark past every real
    # window, flushing the tail windows still held in state
    _sentinel(spark, 10**9).write.mode("append").parquet(events_dir)
    rows2 = _run_once(windowed(_read_events_stream(spark, events_dir)), ckpt, out, "append")

    cutoff = 10**8  # real event_seqs are < 3000; sentinel windows excluded
    real_rows = [r for r in rows2 if r["first_event_seq"] < cutoff]
    got = {(r["window_start"], r["op"]): r for r in real_rows}
    assert len(got) == len(real_rows)  # append mode: each window emits once

    exp_df = (
        with_event_time(ev, events_per_sec=100)
        .groupBy(F.window("event_time", "10 seconds").alias("w"), "op")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("repo").alias("n_repos_approx"),
            F.min("event_seq").alias("first_event_seq"),
            F.max("event_seq").alias("last_event_seq"),
        )
        .select(
            F.col("w.start").alias("window_start"), "op", "n_events",
            "n_repos_approx", "first_event_seq", "last_event_seq",
        )
    )
    expected = {(r["window_start"], r["op"]): r for r in exp_df.collect()}
    assert set(got) == set(expected)
    for k, r in got.items():
        e = expected[k]
        assert (r["n_events"], r["first_event_seq"], r["last_event_seq"]) == (
            e["n_events"], e["first_event_seq"], e["last_event_seq"],
        ), k
        assert r["n_repos_approx"] == e["n_repos_approx"], k

    # pass 3: a row older than the watermark is DROPPED — no window re-emits,
    # no new real window appears (second sentinel forces a flush opportunity)
    late = spark.createDataFrame(
        [(1, "insert", "late/repo", "src/late", "l" * 40, "py", "x", None, 0)],
        schema=EVENT_STREAM_SCHEMA,
    )
    late.write.mode("append").parquet(events_dir)
    _sentinel(spark, 2 * 10**9).write.mode("append").parquet(events_dir)
    rows3 = _run_once(windowed(_read_events_stream(spark, events_dir)), ckpt, out, "append")
    real3 = [r for r in rows3 if r["first_event_seq"] < cutoff]
    assert len(real3) == len(real_rows)  # cumulative real windows unchanged


def test_ordering_gate_drops_stale_redelivery_across_restart(spark, tmp_root):
    events_dir = os.path.join(tmp_root, "events")
    ckpt = os.path.join(tmp_root, "ckpt")
    out = os.path.join(tmp_root, "out")
    ev = change_events(spark, 2500, n_repos=15, seed=23, batch_size=1000)
    wave1 = ev.filter("event_seq < 2000")
    # range-partitioned files: part-00000 holds the lowest seqs, and the file
    # source lists same-mtime files in path order, so triggers deliver the
    # stream in event order — the ordered-arrival contract the gate assumes
    # (cross-batch out-of-order IS the stale case it exists to drop)
    wave1.repartitionByRange(3, "event_seq").write.mode("append").parquet(events_dir)
    _stamp_mtimes(events_dir, 1_000_000_000)

    rows1 = _run_once(
        stateful_ordering_gate(_read_events_stream(spark, events_dir)),
        ckpt, out, "update",
    )
    # every wave-1 event is fresh, each emitted exactly once with its key
    expected1 = {
        (r["repo"], r["path"], r["event_seq"])
        for r in wave1.select("repo", "path", "event_seq").collect()
    }
    assert {(r["repo"], r["path"], r["event_seq"]) for r in rows1} == expected1
    assert len(rows1) == 2000

    # wave 2: full redelivery of wave 1 (stale) + 500 genuinely new events
    wave1.repartition(2).write.mode("append").parquet(events_dir)
    ev.filter("event_seq >= 2000").coalesce(1).write.mode("append").parquet(events_dir)
    rows2 = _run_once(
        stateful_ordering_gate(_read_events_stream(spark, events_dir)),
        ckpt, out, "update",
    )
    # cumulative = all 2500 events exactly once: stale redelivery emitted 0
    assert sorted(r["event_seq"] for r in rows2) == list(range(2500))


def test_ordering_gate_within_batch_dedup(spark, tmp_root):
    """Duplicates arriving in the SAME micro-batch collapse too: the gate
    sorts each Arrow batch by event_seq and filters against the advancing
    max, so replaying a file twice in one trigger emits each event once."""
    events_dir = os.path.join(tmp_root, "events")
    ckpt = os.path.join(tmp_root, "ckpt")
    out = os.path.join(tmp_root, "out")
    ev = change_events(spark, 300, n_repos=5, seed=31, batch_size=100)
    ev.coalesce(1).write.mode("append").parquet(events_dir)
    ev.coalesce(1).write.mode("append").parquet(events_dir)  # duplicate file

    rows = _run_once(
        stateful_ordering_gate(
            _read_events_stream(spark, events_dir, max_files_per_trigger=10)
        ),
        ckpt, out, "update",
    )
    assert sorted(r["event_seq"] for r in rows) == list(range(300))


def test_ordering_gate_ttl_evicts_state(spark, tmp_root):
    """With a TTL, an idle key's state is evicted (bounded memory); a stale
    redelivery AFTER eviction re-emits — the documented exactness trade."""
    import time

    events_dir = os.path.join(tmp_root, "events")
    ckpt = os.path.join(tmp_root, "ckpt")
    out = os.path.join(tmp_root, "out")
    row = [(5, "insert", "r/a", "p", "c" * 40, "py", "x", None, 0)]
    other = [(1, "insert", "r/b", "q", "d" * 40, "py", "y", None, 0)]
    spark.createDataFrame(row, schema=EVENT_STREAM_SCHEMA).write.mode("append").parquet(events_dir)

    def run():
        # ProcessingTimeTimeout keeps scheduling no-data batches to check
        # timeouts, so an availableNow query with a TTL gate never
        # self-terminates — bound each pass and stop it explicitly.
        return _run_once(
            stateful_ordering_gate(
                _read_events_stream(spark, events_dir, max_files_per_trigger=10),
                ttl_minutes=0.02,  # 1.2s
            ),
            ckpt, out, "update", timeout_s=30,
        )

    assert len(run()) == 1  # key r/a seen, state set with TTL
    time.sleep(2.5)  # let the TTL lapse
    # a batch with OTHER data fires the timeout path and evicts r/a's state
    spark.createDataFrame(other, schema=EVENT_STREAM_SCHEMA).write.mode("append").parquet(events_dir)
    assert len(run()) == 2
    # stale redelivery of r/a after eviction re-emits (state was dropped)
    spark.createDataFrame(row, schema=EVENT_STREAM_SCHEMA).write.mode("append").parquet(events_dir)
    rows = run()
    assert len(rows) == 3
