"""Dead-letter quarantine for malformed change events.

A real CDC tail is untrusted input: the upstream connector can emit ops the
applier has never heard of, rows whose key columns are null, or DML rows
with no payload at all.  ``cdc.apply.apply_batch`` historically *silently
dropped* anything outside insert/update/delete — correct for the trusted
fixture, but a silent-data-loss hazard against a real binlog.  This module
makes the drop explicit and auditable:

- :func:`classify_events` — one declarative ``CASE`` column (no UDF, no
  extra scan) tagging each event with a quarantine reason or null.
- :func:`make_quarantine_table` — the dead-letter LakeTable, keyed by
  ``(batch_id, event_seq)`` so redelivered batches upsert instead of
  duplicating: quarantine emission is **exactly-once under crash-retry**,
  same contract as the main table's batch commit (an appended metrics table
  would double rows if the batch crashed after the append but before the
  main commit).

Reference parity: the reference validator's anomaly classes (MISSING /
EXTRA / MISMATCH rows, migration-data-validation.py:880-930) are its
dead-letter analog — rows that failed the contract, persisted with a reason
for the report UI.  This is the same idea applied at ingest time.

Wire-up: ``apply_batch(..., quarantine=dlq_table)`` splits each batch on the
reason column; only clean DML reaches the dedup/MERGE path.  The split is a
filter over the SAME scan (Spark evaluates the CASE twice but scans once per
action), and the quarantine upsert is skipped entirely when the batch's
observed bad-row count is zero, so the steady-state hot path pays no extra
Spark action.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake.table import LakeTable

REASON_UNKNOWN_OP = "unknown_op"
REASON_NULL_KEY = "null_key"
REASON_NO_PAYLOAD = "no_payload"

VALID_OPS = ("insert", "update", "delete")


def classify_reason(
    key_cols: tuple[str, ...] | list[str] = ("repo", "path"),
    op_col: str = "op",
    valid_ops: tuple[str, ...] = VALID_OPS,
    payload_cols: tuple[str, ...] = ("commit",),
    schema_col: str | None = "schema_change",
    has_schema_col: bool = True,
) -> F.Column:
    """The quarantine-reason CASE expression (null = clean) — the single
    source of truth for what counts as a bad row: :func:`classify_events`
    attaches it as a column, and the demux layer's shared per-table
    discovery aggregates it directly (``classify_reason(...).isNotNull()``)
    so the two can never drift.

    Rules, in precedence order (all plain column expressions — the whole
    classification stays in whole-stage codegen):

    1. schema-change events (``schema_col`` non-null) are always clean —
       they carry no key/payload by design;
    2. ``op`` outside ``valid_ops``             → ``unknown_op``;
    3. any key column null                      → ``null_key``;
    4. a non-delete with every payload column
       null (nothing to apply)                  → ``no_payload``.
    """
    null_key = reduce(
        lambda a, b: a | b, [F.col(k).isNull() for k in key_cols]
    )
    no_payload = reduce(
        lambda a, b: a & b, [F.col(c).isNull() for c in payload_cols]
    ) & (F.col(op_col) != "delete")
    reason = (
        F.when(~F.col(op_col).isin(*valid_ops), F.lit(REASON_UNKNOWN_OP))
        .when(null_key, F.lit(REASON_NULL_KEY))
        .when(no_payload, F.lit(REASON_NO_PAYLOAD))
        .otherwise(F.lit(None).cast("string"))
    )
    if schema_col is not None and has_schema_col:
        reason = F.when(F.col(schema_col).isNotNull(), F.lit(None).cast("string")).otherwise(reason)
    return reason


def classify_events(
    events: DataFrame,
    key_cols: tuple[str, ...] | list[str] = ("repo", "path"),
    op_col: str = "op",
    valid_ops: tuple[str, ...] = VALID_OPS,
    payload_cols: tuple[str, ...] = ("commit",),
    schema_col: str | None = "schema_change",
    reason_col: str = "dlq_reason",
) -> DataFrame:
    """Tag each event with a quarantine reason (null = clean); see
    :func:`classify_reason` for the rules."""
    reason = classify_reason(
        key_cols, op_col, valid_ops, payload_cols, schema_col,
        has_schema_col=schema_col is not None and schema_col in events.columns,
    )
    return events.withColumn(reason_col, reason)


QUARANTINE_SCHEMA = [
    ("batch_id", "bigint"),
    ("event_seq", "bigint"),
    ("event_op", "string"),
    ("repo", "string"),
    ("path", "string"),
    ("commit", "string"),
    ("reason", "string"),
    ("quarantined_at", "double"),
]


def make_quarantine_table(spark: SparkSession, root: str) -> LakeTable:
    """Create (or load) the dead-letter table.

    Keyed by (batch_id, event_seq) and written via MERGE, so a redelivered
    batch (crash between quarantine upsert and main-table commit) lands the
    same rows idempotently instead of appending duplicates.
    """
    if LakeTable.exists(root):
        return LakeTable.load(spark, root)
    return LakeTable.create(
        spark,
        root,
        QUARANTINE_SCHEMA,
        key_cols=["batch_id", "event_seq"],
        bucket_col="event_seq",
        num_buckets=4,
    )


def quarantine_rows(
    classified: DataFrame,
    batch_id,
    reason_col: str = "dlq_reason",
) -> DataFrame:
    """Project the tagged bad rows into the quarantine table's change-set
    shape (pre-deduped by construction: event_seq is unique per stream)."""
    import hashlib
    import time

    # batch_id -> stable bigint key: plain ints pass through; the engine's
    # own "stream-<n>" ids keep their ordinal (attribution in the DLQ); any
    # OTHER string hashes to a stable 63-bit int — trailing-digit extraction
    # would collide "run1-5" with "run2-5" and overwrite audit rows
    s = str(batch_id) if batch_id is not None else ""
    if s.isdigit():
        bid = int(s)
    elif s.startswith("stream-") and s[7:].isdigit():
        bid = int(s[7:])
    elif s:
        bid = int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big") >> 1
    else:
        bid = -1
    return classified.filter(F.col(reason_col).isNotNull()).select(
        F.lit(bid).cast("bigint").alias("batch_id"),
        F.col("event_seq").cast("bigint").alias("event_seq"),
        F.col("op").alias("event_op"),
        "repo",
        "path",
        "commit",
        F.col(reason_col).alias("reason"),
        F.lit(time.time()).alias("quarantined_at"),
        F.lit("insert").alias("op"),
    )
