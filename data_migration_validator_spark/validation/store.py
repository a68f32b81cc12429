"""Persisted validation summary / log / metrics tables.

The reference writes every run's outcome into warehouse tables that the
report UI reads back (``ddls/DDLs.py:57-225``: ``validation_summary_table``
with per-check status columns + a metrics struct, ``validation_log_table``
with run status + exception, per-column ``mismatch_metrics``;  writers
``validation_summary.py:266-618``; the SUCCESS/FAILED status machine
``migration-data-validation.py:1756-1769``).

Here the same read-path contract is three LakeTables, partition-keyed by
``run_id`` so a rerun upserts (MERGE) instead of duplicating, and appended
in ONE Spark write per pair (the reference inserts per-stage rows one SQL
INSERT at a time).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake.table import LakeTable

SUMMARY_SCHEMA = [
    ("run_id", "string"),
    ("table_family", "string"),
    ("src_table", "string"),
    ("tgt_table", "string"),
    ("validation_status", "string"),
    ("row_count_status", "string"),
    ("hash_match_status", "string"),
    ("data_mismatch_status", "string"),
    ("extras_status", "string"),
    ("primary_key_compliance_status", "string"),
    ("column_names_status", "string"),
    ("ordinal_status", "string"),
    ("datatype_compatibility_status", "string"),
    ("matches", "bigint"),
    ("mismatches", "bigint"),
    ("src_extras", "bigint"),
    ("tgt_extras", "bigint"),
    ("datatype_mismatch_columns", "bigint"),
    ("quick_validation", "boolean"),
    ("started_at", "double"),
    ("finished_at", "double"),
]

LOG_SCHEMA = [
    ("run_id", "string"),
    ("table_family", "string"),
    ("stage", "string"),
    ("status", "string"),
    ("message", "string"),
    ("event_time", "double"),
]

COLUMN_METRICS_SCHEMA = [
    ("run_id", "string"),
    ("table_family", "string"),
    ("column_name", "string"),
    ("total_overlaps", "bigint"),
    ("matches", "bigint"),
    ("mismatches", "bigint"),
    ("src_extras", "bigint"),
    ("tgt_extras", "bigint"),
]

_STATUS_COLS = [c for c, _ in SUMMARY_SCHEMA if c.endswith("_status")]


def _open(spark: SparkSession, root: str, schema, key_cols, bucket_col) -> LakeTable:
    if LakeTable.exists(root):
        return LakeTable.load(spark, root)
    return LakeTable.create(
        spark, root, schema, key_cols=key_cols, bucket_col=bucket_col, num_buckets=4
    )


def make_summary_table(spark: SparkSession, root: str) -> LakeTable:
    """``validation_summary_table`` analog (DDLs.py:160-225)."""
    return _open(
        spark, root, SUMMARY_SCHEMA, ["run_id", "table_family"], "table_family"
    )


def make_log_table(spark: SparkSession, root: str) -> LakeTable:
    """``validation_log_table`` analog (DDLs.py:142-156): per-stage status
    rows including failures with the exception text."""
    return _open(
        spark, root, LOG_SCHEMA, ["run_id", "table_family", "stage"], "table_family"
    )


def make_column_metrics_table(spark: SparkSession, root: str) -> LakeTable:
    """``mismatch_metrics`` analog (conf/constants.py:51-69 table family)."""
    return _open(
        spark,
        root,
        COLUMN_METRICS_SCHEMA,
        ["run_id", "table_family", "column_name"],
        "table_family",
    )


def persist_summary(
    table: LakeTable,
    run_id: str,
    table_family: str,
    summary: dict,
    src_table: str = "",
    tgt_table: str = "",
    quick: bool = False,
    started_at: float | None = None,
    finished_at: float | None = None,
) -> None:
    """Upsert one summary row (MERGE on (run_id, table_family) so a retried
    pair overwrites its half-written row instead of duplicating)."""
    now = time.time()
    row = {
        "run_id": run_id,
        "table_family": table_family,
        "src_table": src_table,
        "tgt_table": tgt_table,
        "matches": int(summary.get("matches", 0)),
        "mismatches": int(summary.get("mismatches", 0)),
        "src_extras": int(summary.get("src_extras", 0)),
        "tgt_extras": int(summary.get("tgt_extras", 0)),
        "datatype_mismatch_columns": int(summary.get("datatype_mismatch_columns", 0)),
        "quick_validation": bool(quick),
        "started_at": started_at if started_at is not None else now,
        "finished_at": finished_at if finished_at is not None else now,
    }
    for c in _STATUS_COLS:
        row[c] = summary.get(c)
    df = table.spark.createDataFrame(
        [tuple(row[c] for c, _ in SUMMARY_SCHEMA)],
        ", ".join(f"{c} {t}" for c, t in SUMMARY_SCHEMA),
    ).withColumn("op", F.lit("update"))
    table.merge(df, op_col="op")


def persist_log(table: LakeTable, rows: list[dict]) -> None:
    """Append a batch of per-stage log rows in one write."""
    if not rows:
        return
    df = table.spark.createDataFrame(
        [
            tuple(r.get(c) for c, _ in LOG_SCHEMA)
            for r in rows
        ],
        ", ".join(f"{c} {t}" for c, t in LOG_SCHEMA),
    ).withColumn("op", F.lit("update"))
    table.merge(df, op_col="op")


def persist_column_metrics(
    table: LakeTable, run_id: str, table_family: str, metrics: DataFrame
) -> None:
    """Persist a ``column_mismatch_metrics`` frame — stays a Spark plan end
    to end (lit-tagged and MERGEd; no driver collect)."""
    tagged = metrics.select(
        F.lit(run_id).alias("run_id"),
        F.lit(table_family).alias("table_family"),
        "column_name",
        "total_overlaps",
        "matches",
        "mismatches",
        "src_extras",
        "tgt_extras",
        F.lit("update").alias("op"),
    )
    table.merge(tagged, op_col="op")
