"""Multi-table CDC demux: one ordered change stream carrying MANY tables,
routed to per-table lake tables in a single pass per micro-batch.

A real binlog/WAL tail is rarely single-table — the stream interleaves
changes for every table the source database touches.  The single-table
engine core (``cdc.apply.apply_batch``) stays untouched; this module adds
the routing layer:

- the mixed batch is persisted ONCE and sliced per table with a pushdown
  filter on the routing column, so T tables cost one scan + T cached
  filters, not T scans of the source;
- **per-table exactly-once**: every destination LakeTable keeps its own
  batch commit log, so a crash mid-loop (table A committed, table B not)
  resumes correctly — the redelivered batch no-ops on A and applies on B;
- rows whose routing value matches NO registered table are dead-lettered
  with reason ``unknown_table`` (same exactly-once (batch_id, event_seq)
  keyed upsert as :mod:`cdc.quarantine`) instead of vanishing;
- per-table lineage: pass a dict of lineage tables — batch_id/partition_id
  keys stay disjoint because each table writes to its own metrics table.

At cluster scale each per-table apply is a full distributed job over that
table's slice; ``max_workers > 1`` submits them concurrently from driver
threads (per-table scheduler pools), so the cluster is never idle between
small per-table jobs — per-table commit logs make the concurrent fan-out
exactly-once, and the shared quarantine handle serializes its own writes.
With hundreds of tables, cap ``max_workers`` near the cluster's concurrent
job headroom or run multiple demux jobs over disjoint table sets — the
commit-log idempotence makes any split safe.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lake.table import LakeTable
from .apply import apply_batch
from .quarantine import quarantine_rows

REASON_UNKNOWN_TABLE = "unknown_table"


class DemuxBatchError(RuntimeError):
    """One or more per-table applies failed inside a demux fan-out.

    The concurrent fan-out runs every table's apply to completion before
    raising, so a multi-table failure surfaces as ALL of its per-table
    errors (``failures``: {table_name: exception}) plus the stats of the
    tables that DID commit (``partial``) — not just whichever future
    happened to be inspected first.  Committed tables no-op on redelivery
    (per-table commit logs), so the caller can retry the batch as-is."""

    def __init__(self, failures: dict, partial: dict):
        names = ", ".join(sorted(failures))
        first = next(iter(failures.values()))
        super().__init__(
            f"demux batch failed for {len(failures)} table(s) [{names}]; "
            f"{len(partial)} table(s) committed and will no-op on retry. "
            f"First error: {first!r}"
        )
        self.failures = failures
        self.partial = partial


def demux_batch(
    tables: dict[str, LakeTable],
    events: DataFrame,
    batch_id=None,
    table_col: str = "table_name",
    lineage: dict[str, LakeTable] | None = None,
    quarantine: LakeTable | None = None,
    salt_buckets: int = 1,
    merge_mode: str | None = None,
    max_workers: int = 1,
) -> dict:
    """Apply one mixed micro-batch to every registered table.

    Returns {table_name: apply_batch stats, "__unknown__": n} — tables whose
    commit log already holds ``batch_id`` report ``skipped``.

    ``max_workers > 1`` submits the per-table applies CONCURRENTLY from
    driver threads: with T tables the serial loop pays T sequential jobs'
    planning/commit latency per micro-batch while executors idle between
    small jobs — the round-3 review's one perf-weak finding.  Concurrency
    is safe by construction: each destination table owns its manifest and
    commit log (per-table exactly-once — a crash mid-fan-out redelivers,
    committed tables no-op), the shared quarantine handle serializes its
    own writes (LakeTable._write_lock), and each task tags its jobs with a
    scheduler pool (``demux-<table>``) so a FAIR-scheduled cluster shares
    slots evenly; under default FIFO, later jobs still backfill free slots.
    """
    pending = {
        name: t
        for name, t in tables.items()
        if batch_id is None or not t.has_batch(batch_id)
    }
    out: dict = {}
    if not pending and quarantine is None:
        return {name: {"skipped": True, "batch_id": batch_id} for name in tables}

    # NULL routing values must be dead-lettered too: a bare ~isin evaluates
    # to NULL for them and the filter would silently drop the rows — the
    # exact silent-loss mode this module exists to close.
    unknown_cond = F.col(table_col).isNull() | ~F.col(table_col).isin(
        *tables.keys()
    )
    obs = None
    if quarantine is not None and pending:
        # the unknown-row COUNT rides the cache-materialization action via
        # observe — no separate count job per micro-batch (the single-table
        # path fuses its bad-row count the same way)
        from pyspark.sql import Observation

        obs = Observation()
        events = events.observe(
            obs, F.sum(unknown_cond.cast("long")).alias("n_unknown")
        )
    events = events.persist()
    try:
        # quarantine work only when at least one table still needs the
        # batch: on a fully-committed redelivery the unknown-row upsert
        # already happened (it runs before any table commit), so re-running
        # it would pay a scan + MERGE commit for zero effect
        if obs is not None:
            # ONE action: fills the shared cache (the fan-out's slices and
            # the quarantine filter below are cached scans) AND lands the
            # observed unknown count
            events.count()
            n_unknown = int(obs.get.get("n_unknown") or 0)
            if n_unknown:
                unknown = events.filter(unknown_cond).withColumn(
                    "dlq_reason", F.lit(REASON_UNKNOWN_TABLE)
                )
                quarantine.merge(
                    quarantine_rows(unknown, batch_id), count_deletes=False
                )
            out["__unknown__"] = n_unknown

        def _one(name: str, t: LakeTable) -> dict:
            spark = t.spark
            # per-table pool: on a FAIR-scheduled cluster each table's jobs
            # get an even share; local properties are per-thread so tasks
            # never leak pools across the executor's thread reuse
            spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", f"demux-{name}"
            )
            try:
                slice_df = events.filter(
                    F.col(table_col) == name
                ).drop(table_col)
                return apply_batch(
                    t,
                    slice_df,
                    batch_id=batch_id,
                    lineage=(lineage or {}).get(name),
                    salt_buckets=salt_buckets,
                    merge_mode=merge_mode,
                    quarantine=quarantine,
                )
            finally:
                spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)

        todo = [(n, t) for n, t in tables.items() if n in pending]
        for name in tables:
            if name not in pending:
                out[name] = {"skipped": True, "batch_id": batch_id}
        if max_workers > 1 and len(todo) > 1:
            # materialize the shared cache ONCE before the fan-out so the
            # threads' first actions don't race to compute it in duplicate
            # (already done by the observed count when quarantining)
            if obs is None:
                events.count()
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(max_workers, len(todo))
            ) as pool:
                futs = {n: pool.submit(_one, n, t) for n, t in todo}
            # every future ran to completion inside the with-block: report
            # ALL failures (+ the committed tables' stats), not just the
            # first in dict order — a multi-table failure must not
            # masquerade as a single-table one
            failures: dict[str, BaseException] = {}
            for n, fut in futs.items():
                err = fut.exception()
                if err is None:
                    out[n] = fut.result()
                else:
                    failures[n] = err
            if failures:
                raise DemuxBatchError(failures, out) from next(
                    iter(failures.values())
                )
        else:
            for name, t in todo:
                out[name] = _one(name, t)
    finally:
        events.unpersist()
    return out


def demux_replay(
    tables: dict[str, LakeTable],
    events_dir: str,
    table_col: str = "table_name",
    lineage: dict[str, LakeTable] | None = None,
    quarantine: LakeTable | None = None,
    salt_buckets: int = 1,
    merge_mode: str | None = None,
    max_workers: int = 1,
) -> dict:
    """Ordered batch replay of a mixed stream (the multi-table analog of
    :func:`cdc.replay.replay`).  A batch is re-read only if at least one
    destination table has not committed it."""
    t0 = time.monotonic()
    spark = next(iter(tables.values())).spark
    batch_ids = sorted(
        int(d.split("=")[1])
        for d in os.listdir(events_dir)
        if d.startswith("batch_hint=")
    )
    per_table_applied = {name: 0 for name in tables}
    n_skipped = 0
    for bid in batch_ids:
        if all(t.has_batch(bid) for t in tables.values()):
            n_skipped += 1
            continue
        batch_df = spark.read.parquet(os.path.join(events_dir, f"batch_hint={bid}"))
        stats = demux_batch(
            tables,
            batch_df,
            batch_id=bid,
            table_col=table_col,
            lineage=lineage,
            quarantine=quarantine,
            salt_buckets=salt_buckets,
            merge_mode=merge_mode,
            max_workers=max_workers,
        )
        for name in tables:
            if not stats[name].get("skipped"):
                per_table_applied[name] += 1
    return {
        "batches_total": len(batch_ids),
        "batches_skipped": n_skipped,
        "applied_per_table": per_table_applied,
        "wall_s": time.monotonic() - t0,
    }
