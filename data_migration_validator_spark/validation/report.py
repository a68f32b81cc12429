"""Report read-path: the queries the reference's dashboard runs over the
persisted summary / metrics / anomaly tables, as declarative DataFrame
plans over ``validation.store`` LakeTables.

Reference parity:
- summary conjunction with NULL-is-FAILED semantics
  (``validation_sqls.py:17-76``: the chained ``IF(status IS NULL OR
  status == 'FAILED', false, true)`` AND-fold);
- top mismatched columns, ``order by mismatches desc``
  (``validation_v3.py:595-639``);
- anomaly/mismatch row browser: per-status filter + row cap
  (``validation_v3.py:658-712``, caps at :630-707).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_CONJUNCTION_COLS = [
    "row_count_status",
    "hash_match_status",
    "data_mismatch_status",
    "extras_status",
    "primary_key_compliance_status",
    "column_names_status",
    "ordinal_status",
    "datatype_compatibility_status",
]


def summary_conjunction(summary: DataFrame) -> DataFrame:
    """Re-derive the final status from the persisted per-check columns with
    the reference's NULL-is-FAILED rule (validation_sqls.py:24-63) — the
    stored ``validation_status`` is written by the run; this is the read
    side's independent conjunction over what actually landed."""
    ok = F.lit(True)
    for c in _CONJUNCTION_COLS:
        ok = ok & F.when(
            F.col(c).isNull() | (F.col(c) == "FAILED"), F.lit(False)
        ).otherwise(F.lit(True))
    return summary.select(
        "run_id",
        "table_family",
        "src_table",
        "tgt_table",
        F.when(ok, F.lit("SUCCESS")).otherwise(F.lit("FAILED")).alias(
            "final_validation_status"
        ),
        *_CONJUNCTION_COLS,
        "matches",
        "mismatches",
        "src_extras",
        "tgt_extras",
        (F.col("finished_at") - F.col("started_at")).alias("duration_s"),
    ).orderBy("run_id", "table_family")


def latest_run_per_family(summary: DataFrame) -> DataFrame:
    """Most recent summary row per table_family (the dashboard's default
    view): latest-per-key window, W4 shape."""
    w = Window.partitionBy("table_family").orderBy(
        F.col("finished_at").desc(), F.col("run_id").desc()
    )
    return (
        summary.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_mismatched_columns(
    column_metrics: DataFrame, k: int = 10, run_id: str | None = None
) -> DataFrame:
    """Columns ranked by mismatches desc (validation_v3.py:595-614) —
    partition-pruned by run when given."""
    df = column_metrics
    if run_id is not None:
        df = df.filter(F.col("run_id") == run_id)
    return (
        df.filter(F.col("mismatches") > 0)
        .orderBy(F.col("mismatches").desc(), "column_name")
        .limit(k)
    )


def anomaly_browser(
    anomalies: DataFrame,
    status: str | None = None,
    predicate: str | None = None,
    limit: int = 10_000,
) -> DataFrame:
    """Row browser over an anomaly/mismatch frame: status filter + optional
    declarative predicate + the reference's row cap (validation_v3.py:
    690-707 caps at 10,000).  The cap is presentation-only — pushdown keeps
    the scan bounded, and the caller can raise it."""
    df = anomalies
    if status is not None:
        status_col = "status" if "status" in df.columns else "side"
        df = df.filter(F.col(status_col) == status)
    if predicate is not None:
        df = df.where(predicate)
    return df.limit(limit)


def failed_stages(log: DataFrame, run_id: str | None = None) -> DataFrame:
    """FAILED per-stage log rows with their exception text — the
    validation_log_table read (DDLs.py:142-156, exception column)."""
    df = log.filter(F.col("status") == "FAILED")
    if run_id is not None:
        df = df.filter(F.col("run_id") == run_id)
    return df.orderBy("run_id", "table_family", "event_time")
