"""Per-trigger streaming progress metrics.

The lineage table (``cdc.apply._emit_lineage``) records WHAT each batch did
to the table (offsets, row counts, apply latency) — the data-plane audit the
north rule asks for.  This module adds the ops-plane view: Spark's own
per-trigger progress (input rows/s, processed rows/s, trigger wall), captured
through a ``StreamingQueryListener`` and persisted to a lake table, so
operators can watch ingest lag and throughput without scraping driver logs.

Listener events are delivered on a separate driver thread AFTER the trigger
commits, so capture is zero-cost on the micro-batch path; ``flush_to`` is
called once per run (or on a schedule), not per trigger.

Reading the numbers: ``num_input_rows`` is Spark's count of source rows
READ during the trigger — a foreachBatch sink that runs k actions over the
un-cached batch frame re-scans the source k times, so
``num_input_rows / batch events`` is the trigger's SCAN AMPLIFICATION
(e.g. 2× for the engine's fused stats + write pair).  Watch it: a regression
that adds a per-batch action shows up here before it shows up in wall time.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

from ..lake.table import LakeTable

PROGRESS_SCHEMA = [
    ("query_id", "string"),
    ("batch_id", "bigint"),
    ("num_input_rows", "bigint"),
    ("input_rows_per_second", "double"),
    ("processed_rows_per_second", "double"),
    ("trigger_ms", "bigint"),
    ("event_time", "string"),
]


class ProgressMetricsListener(StreamingQueryListener):
    """Collects one row per completed trigger; thread-safe."""

    def __init__(self):
        self._lock = threading.Lock()
        self.rows: list[tuple] = []

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = json.loads(event.progress.json)
        durations = p.get("durationMs", {}) or {}
        with self._lock:
            self.rows.append(
                (
                    str(p.get("id")),
                    int(p.get("batchId", -1)),
                    int(p.get("numInputRows", 0) or 0),
                    float(p.get("inputRowsPerSecond", 0.0) or 0.0),
                    float(p.get("processedRowsPerSecond", 0.0) or 0.0),
                    int(durations.get("triggerExecution", 0) or 0),
                    str(p.get("timestamp")),
                )
            )

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass

    def snapshot(self) -> list[tuple]:
        with self._lock:
            return list(self.rows)

    def flush_to(self, table: LakeTable, query_id: str | None = None) -> int:
        """Append captured trigger rows to ``table``; returns rows flushed.

        ``query_id``: the listener is session-wide (Spark delivers every
        query's progress to every listener), so pass the owning query's id
        to flush ONLY its rows — otherwise a concurrent stream's triggers
        land in this table too.  Rows leave the buffer only AFTER the
        append commits, so a failed append keeps them for retry (duplicates
        across a crash-retry remain possible and harmless — consumers
        aggregate by (query_id, batch_id))."""
        with self._lock:
            rows = [
                r for r in self.rows
                if query_id is None or r[0] == str(query_id)
            ]
        if not rows:
            return 0
        df = table.spark.createDataFrame(
            rows, schema=", ".join(f"{n} {t}" for n, t in PROGRESS_SCHEMA)
        )
        table.append(df)
        flushed = set(rows)
        with self._lock:
            self.rows = [r for r in self.rows if r not in flushed]
        return len(rows)


def make_progress_table(spark: SparkSession, root: str) -> LakeTable:
    if LakeTable.exists(root):
        return LakeTable.load(spark, root)
    return LakeTable.create(
        spark,
        root,
        PROGRESS_SCHEMA,
        key_cols=["query_id", "batch_id"],
        bucket_col="batch_id",
        num_buckets=4,
    )
