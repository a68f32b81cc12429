"""Event-time streaming surface: watermarked windowed metrics and a
custom stateful per-key ordering gate.

Two streaming shapes the batch engine does not cover (SURVEY.md §2.9):

- :func:`windowed_event_metrics` — the STREAMING form of the reference's
  ``windowed_validation_metrics`` rollup (migration-data-validation.py:
  798-831; DDLs.py:57-90): tumbling event-time windows with a watermark, so
  late events inside the tolerance still land in their window and windows
  finalize (append-mode emit) once the watermark passes — no stop-the-world
  batch re-aggregation over the whole stream.
- :func:`stateful_ordering_gate` — row-level redelivery/ordering protection
  via ``applyInPandasWithState``: per (repo, path) the state holds the
  highest applied event_seq; only events that ADVANCE it pass downstream.
  This complements the sink's batch-id idempotency (streaming/stream.py):
  batch ids absorb whole-batch redelivery, the gate absorbs row-level
  duplication or an out-of-order tail inside a resumed source.

Scale notes (10^10 events, 1000 executors):

- The windowed aggregate is a streaming hash aggregate keyed by
  (window, op) — partial aggregation happens map-side per micro-batch, and
  state size is O(open windows × ops), independent of event count.
  Watermark delay bounds how many windows stay open.
- The ordering gate's state is O(distinct keys). ``ttl`` evicts idle keys
  (ProcessingTimeTimeout) to bound memory; with eviction the gate degrades
  from exact to at-most-TTL-window protection — callers that need exact
  semantics leave ``ttl=None`` and size state accordingly (state is
  checkpointed to the state store, partitioned by key hash, so it shards
  across executors like any shuffle).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Deterministic synthetic event-time epoch (2026-01-01 UTC) — the fixture's
#: event_seq is a logical clock; tests and benches map it to wall time here.
EVENT_TIME_EPOCH = 1_767_225_600


def with_event_time(
    df: DataFrame,
    events_per_sec: int = 100,
    epoch: int = EVENT_TIME_EPOCH,
    seq_col: str = "event_seq",
    time_col: str = "event_time",
) -> DataFrame:
    """Derive a deterministic event-time column from the ordered sequence.

    The change-event fixture (cdc/events.py) carries a logical clock
    (``event_seq``); real CDC sources carry a commit/LSN timestamp.  This
    maps seq → timestamp at ``events_per_sec`` so the same fixture drives
    the event-time operators, keeping tests seeded and reproducible.
    """
    return df.withColumn(
        time_col,
        F.timestamp_seconds(F.lit(epoch) + F.col(seq_col) / F.lit(events_per_sec)),
    )


def windowed_event_metrics(
    stream: DataFrame,
    window_duration: str = "1 minute",
    watermark_delay: str = "30 seconds",
    time_col: str = "event_time",
) -> DataFrame:
    """Watermarked tumbling-window per-op metrics over an event stream.

    Output: (window_start, window_end, op, n_events, n_repos_approx,
    first_event_seq, last_event_seq).  In append output mode a window row
    emits exactly once, when the watermark passes ``window_end`` — late
    events within ``watermark_delay`` still count; later ones are dropped
    by the watermark (the documented trade of bounded state).

    ``approx_count_distinct`` (HLL) keeps the distinct-repo metric
    mergeable map-side; exact COUNT DISTINCT is not available to a
    watermarked append-mode aggregate and would hold per-repo state.
    """
    return (
        stream.withWatermark(time_col, watermark_delay)
        .groupBy(F.window(F.col(time_col), window_duration).alias("w"), "op")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("repo").alias("n_repos_approx"),
            F.min("event_seq").alias("first_event_seq"),
            F.max("event_seq").alias("last_event_seq"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op",
            "n_events",
            "n_repos_approx",
            "first_event_seq",
            "last_event_seq",
        )
    )


#: Pass-through payload of the ordering gate (input minus the grouping key).
#: Carries the full event-stream shape (schema_change, batch_hint included)
#: so the gate's output is drop-in for the ingest sink (cdc.apply_batch).
_GATE_STATE = "max_seq bigint"


def stateful_ordering_gate(
    stream: DataFrame,
    ttl_minutes: float | None = None,
    key_cols: tuple[str, ...] = ("repo", "path"),
    order_col: str = "event_seq",
) -> DataFrame:
    """Per-key monotonic sequence gate: emit only events that advance the
    key's highest-seen ``event_seq``; stale redeliveries are dropped.

    Built on ``applyInPandasWithState`` — the custom-stateful-operator
    surface: state = one bigint per (repo, path), batches arrive as Arrow
    frames (no per-row Python), emitted rows stay in event order per key.

    ``ttl_minutes`` bounds state via ProcessingTimeTimeout eviction; after
    an eviction a sufficiently late duplicate would re-emit — exactness vs
    bounded memory is the caller's trade (module docstring).

    The payload/output schema is DERIVED from the input stream (everything
    but the key columns), so the gate works unchanged on extended streams —
    e.g. the multi-table demux feed with its routing column — instead of
    hard-coding the canonical fixture's columns.
    """
    key_cols = list(key_cols)
    payload_cols = [c for c in stream.columns if c not in key_cols]
    if order_col not in payload_cols:
        raise ValueError(f"stream lacks order column {order_col!r}")
    out_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in stream.schema.fields
        if f.name in key_cols
    ) + ", " + ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in stream.schema.fields
        if f.name not in key_cols
    )

    def gate(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        max_seq = state.get[0] if state.exists else -1
        # One concat per (key, batch): Arrow may hand the group as several
        # chunks in arbitrary seq order; sorting and deduping the whole
        # group at once keeps the gate exact within a batch (an identical
        # seq redelivered in the SAME trigger collapses too).
        chunks = list(pdfs)
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        fresh = (
            pdf.sort_values(order_col)
            .drop_duplicates(subset=[order_col], keep="first")
        )
        fresh = fresh[fresh[order_col] > max_seq]
        if len(fresh):
            max_seq = int(fresh[order_col].iloc[-1])
        state.update((max_seq,))
        if ttl_minutes is not None:
            state.setTimeoutDuration(int(ttl_minutes * 60_000))
        if len(fresh):
            fresh = fresh[payload_cols].copy()
            for i, (k, v) in enumerate(zip(key_cols, key)):
                fresh.insert(i, k, v)
            yield fresh

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        stream.select(*key_cols, *payload_cols)
        .groupBy(*key_cols)
        .applyInPandasWithState(gate, out_ddl, _GATE_STATE, "update", timeout)
    )
