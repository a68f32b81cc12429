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
    ("mismatches_after_exclusion_status", "string"),
    ("comment_compare_status", "string"),
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
    # named report slice (reference MISMATCH_METRICS.addtnl_filter,
    # MDV:1137-1188): "N/A" = the unfiltered base metrics row
    ("addtnl_filter", "string"),
    ("total_overlaps", "bigint"),
    ("matches", "bigint"),
    ("mismatches", "bigint"),
    ("src_extras", "bigint"),
    ("tgt_extras", "bigint"),
]

ANOMALY_SCHEMA = [
    ("run_id", "string"),
    ("table_family", "string"),
    ("status", "string"),  # MISMATCH_SRC | MISMATCH_TGT | SRC_EXTRA | TGT_EXTRA
    ("key_json", "string"),  # to_json(struct(key cols)) — pair-agnostic key
    ("row", "map<string,string>"),  # compared columns, stringified
]

WINDOWED_SCHEMA = [
    ("run_id", "string"),
    ("table_family", "string"),
    ("bucket_date", "date"),
    ("src_count", "bigint"),
    ("tgt_count", "bigint"),
    ("src_extras", "bigint"),
    ("tgt_extras", "bigint"),
    ("mismatched_rows", "bigint"),
]

PK_SCHEMA = [
    ("run_id", "string"),
    ("table_family", "string"),
    ("side", "string"),  # src | tgt
    ("total_count", "bigint"),
    ("distinct_count", "bigint"),
    ("pk_violations", "bigint"),
]

DQ_SCHEMA = [
    ("run_id", "string"),
    ("table_family", "string"),
    ("side", "string"),  # src | tgt
    ("rule", "string"),
    ("kind", "string"),
    ("target", "string"),
    ("violations", "bigint"),
    ("total", "bigint"),
    ("status", "string"),
]

PROFILE_SCHEMA = [
    ("run_id", "string"),
    ("table_family", "string"),
    ("side", "string"),  # src | tgt
    ("column", "string"),
    ("dtype", "string"),
    ("n_rows", "bigint"),
    ("n_nulls", "bigint"),
    ("n_distinct", "bigint"),
    ("min_num", "double"),
    ("max_num", "double"),
    ("min_str", "string"),
    ("max_str", "string"),
    ("min_ts", "timestamp"),
    ("max_ts", "timestamp"),
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
        ["run_id", "table_family", "column_name", "addtnl_filter"],
        "table_family",
    )


def make_anomaly_table(spark: SparkSession, root: str) -> LakeTable:
    """``__anomalies`` / ``__mismatch_data`` analog (conf/constants.py:51-69;
    writes migration-data-validation.py:1228-1241, 1351-1364).

    The reference creates one dynamically-schemed staging table per table
    family; here ONE fixed-schema table serves every pair — the composite
    key goes to ``key_json`` (``to_json(struct(keys))``) and the compared
    columns to a string map, so the browser can filter any family without
    per-family DDL and the MERGE key stays stable."""
    return _open(
        spark,
        root,
        ANOMALY_SCHEMA,
        ["run_id", "table_family", "status", "key_json"],
        "table_family",
    )


def make_windowed_table(spark: SparkSession, root: str) -> LakeTable:
    """``windowed_validation_metrics`` analog (DDLs.py:57-90; writes
    migration-data-validation.py:1366-1384)."""
    return _open(
        spark,
        root,
        WINDOWED_SCHEMA,
        ["run_id", "table_family", "bucket_date"],
        "table_family",
    )


def make_pk_table(spark: SparkSession, root: str) -> LakeTable:
    """``primary_key_validation`` analog (DDLs.py:93-118; writes
    migration-data-validation.py:1444-1459)."""
    return _open(
        spark, root, PK_SCHEMA, ["run_id", "table_family", "side"], "table_family"
    )


def make_dq_table(spark: SparkSession, root: str) -> LakeTable:
    """Single-table contract check results (validation/quality.py) — the
    constraint surface a warehouse enforces by DDL but a lake does not;
    no reference analog table (its checks are pairwise only)."""
    return _open(
        spark, root, DQ_SCHEMA,
        ["run_id", "table_family", "side", "rule"], "table_family",
    )


def make_profile_table(spark: SparkSession, root: str) -> LakeTable:
    """Per-column profile snapshots (validation/profile.py) — persisted so
    drift between RUNS (yesterday's load vs today's) is one read-back diff,
    no rescan of historical data."""
    return _open(
        spark, root, PROFILE_SCHEMA,
        ["run_id", "table_family", "side", "column"], "table_family",
    )


def persist_dq(
    table: LakeTable, run_id: str, table_family: str, side: str,
    report: DataFrame,
) -> None:
    """Persist a quality.run_checks report (lit-tagged MERGE).  Rerun-safe:
    the (run, family, side) slice is cleared first so dropped rules
    disappear — side-scoped so persisting src then tgt keeps both."""
    _clear_side_slice(table, run_id, table_family, side)
    tagged = report.select(
        F.lit(run_id).alias("run_id"),
        F.lit(table_family).alias("table_family"),
        F.lit(side).alias("side"),
        "rule", "kind", "target", "violations", "total", "status",
        F.lit("update").alias("op"),
    )
    table.merge(tagged, op_col="op")


def persist_profile(
    table: LakeTable, run_id: str, table_family: str, side: str,
    profile: DataFrame, max_str_len: int = 256,
) -> None:
    """Persist a profile_columns frame for one side (lit-tagged MERGE).
    Rerun-safe via side-scoped slice clear.

    ``min_str``/``max_str`` are truncated to ``max_str_len`` chars at
    persist time: a profiled long-text column (document bodies) would
    otherwise store entire documents as its extrema in a table meant to
    hold a few hundred scalar rows per run.  Truncation is applied on
    every run, so cross-run drift compares stay prefix-consistent."""
    _clear_side_slice(table, run_id, table_family, side)
    tagged = profile.select(
        F.lit(run_id).alias("run_id"),
        F.lit(table_family).alias("table_family"),
        F.lit(side).alias("side"),
        "column", "dtype", "n_rows", "n_nulls", "n_distinct",
        "min_num", "max_num",
        F.substring("min_str", 1, max_str_len).alias("min_str"),
        F.substring("max_str", 1, max_str_len).alias("max_str"),
        "min_ts", "max_ts",
        F.lit("update").alias("op"),
    )
    table.merge(tagged, op_col="op")


def _clear_side_slice(
    table: LakeTable, run_id: str, table_family: str, side: str
) -> None:
    rid = run_id.replace("'", "''")
    fam = table_family.replace("'", "''")
    sd = side.replace("'", "''")
    table.delete_where(
        f"run_id = '{rid}' AND table_family = '{fam}' AND side = '{sd}'"
    )


def _clear_slice(table: LakeTable, run_id: str, table_family: str) -> None:
    """Replace semantics for per-(run_id, table_family) detail tables: MERGE
    alone is upsert-only, so a RERUN of the same run_id would leave stale
    rows for anomalies/buckets that no longer exist (fixed data would still
    browse as mismatched).  Delete the slice first; the following merge
    lands the fresh rows.  Quotes in values are doubled — the predicate is
    parsed by Spark's own SQL parser."""
    rid = run_id.replace("'", "''")
    fam = table_family.replace("'", "''")
    table.delete_where(f"run_id = '{rid}' AND table_family = '{fam}'")


def persist_anomalies(
    table: LakeTable,
    run_id: str,
    table_family: str,
    annotated: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> None:
    """Persist every non-MATCH row from the annotated comparison frame in
    ONE MERGE: mismatches as two rows (src + tgt version), extras as one.
    A narrow derivation — no new src×tgt join; the caller's persisted
    annotated frame is the only data pass.  Rerun-safe: the run's slice is
    cleared first (see _clear_slice)."""
    _clear_slice(table, run_id, table_family)
    key_json = F.to_json(F.struct(*[F.col(k) for k in key_cols]))

    def _side(suffix: str, status_val, status_name: str) -> DataFrame:
        return annotated.filter(F.col("status") == status_val).select(
            F.lit(run_id).alias("run_id"),
            F.lit(table_family).alias("table_family"),
            F.lit(status_name).alias("status"),
            key_json.alias("key_json"),
            F.map_from_arrays(
                F.array(*[F.lit(c) for c in compare_cols]),
                F.array(
                    *[F.col(f"{c}_{suffix}").cast("string") for c in compare_cols]
                ),
            ).alias("row"),
        )

    out = (
        _side("src", "MISMATCH", "MISMATCH_SRC")
        .unionByName(_side("tgt", "MISMATCH", "MISMATCH_TGT"))
        .unionByName(_side("src", "SRC_EXTRA", "SRC_EXTRA"))
        .unionByName(_side("tgt", "TGT_EXTRA", "TGT_EXTRA"))
        .withColumn("op", F.lit("update"))
    )
    table.merge(out, op_col="op")


def persist_windowed(
    table: LakeTable, run_id: str, table_family: str, windowed: DataFrame
) -> None:
    """Persist a windowed_validation frame (lit-tagged MERGE, no collect).
    Rerun-safe: the run's slice is cleared first (see _clear_slice)."""
    _clear_slice(table, run_id, table_family)
    tagged = windowed.select(
        F.lit(run_id).alias("run_id"),
        F.lit(table_family).alias("table_family"),
        "bucket_date",
        *[
            F.col(c).cast("bigint").alias(c)
            for c in (
                "src_count", "tgt_count", "src_extras", "tgt_extras",
                "mismatched_rows",
            )
        ],
        F.lit("update").alias("op"),
    )
    table.merge(tagged, op_col="op")


def persist_pk(
    table: LakeTable,
    run_id: str,
    table_family: str,
    pk_src: DataFrame,
    pk_tgt: DataFrame,
) -> None:
    """Persist both sides' PK checks as two rows in one MERGE."""

    def _tag(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.lit(run_id).alias("run_id"),
            F.lit(table_family).alias("table_family"),
            F.lit(side).alias("side"),
            F.col("total_count").cast("bigint").alias("total_count"),
            F.col("distinct_count").cast("bigint").alias("distinct_count"),
            F.col("pk_violations").cast("bigint").alias("pk_violations"),
        )

    out = _tag(pk_src, "src").unionByName(_tag(pk_tgt, "tgt")).withColumn(
        "op", F.lit("update")
    )
    table.merge(out, op_col="op")


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
    """Upsert a batch of per-stage log rows in one write.

    MERGE requires one row per key, so duplicate (run_id, table_family,
    stage) entries are collapsed keeping the LAST — a stage retried within
    one run records its final status."""
    if not rows:
        return
    by_key = {(r["run_id"], r["table_family"], r["stage"]): r for r in rows}
    df = table.spark.createDataFrame(
        [
            tuple(r.get(c) for c, _ in LOG_SCHEMA)
            for r in by_key.values()
        ],
        ", ".join(f"{c} {t}" for c, t in LOG_SCHEMA),
    ).withColumn("op", F.lit("update"))
    table.merge(df, op_col="op")


def persist_column_metrics(
    table: LakeTable, run_id: str, table_family: str, metrics: DataFrame,
    addtnl_metrics: DataFrame | None = None,
) -> None:
    """Persist a ``column_mismatch_metrics`` frame — stays a Spark plan end
    to end (lit-tagged and MERGEd; no driver collect).  Rerun-safe: the
    run's slice is cleared first (see _clear_slice).

    ``addtnl_metrics``: optional per-slice frame from the pipeline's
    ``addtnl_filter_metrics`` report — persisted into the SAME table under
    its slice names, mirroring the reference's MISMATCH_METRICS rows
    (base rows land as addtnl_filter='N/A'; extras are overlap-only for
    slices, stored as 0 like the reference's per-filter counters)."""
    _clear_slice(table, run_id, table_family)
    tagged = metrics.select(
        F.lit(run_id).alias("run_id"),
        F.lit(table_family).alias("table_family"),
        "column_name",
        F.lit("N/A").alias("addtnl_filter"),
        "total_overlaps",
        "matches",
        "mismatches",
        "src_extras",
        "tgt_extras",
        F.lit("update").alias("op"),
    )
    if addtnl_metrics is not None:
        slices = addtnl_metrics.filter(F.col("addtnl_filter") != "N/A").select(
            F.lit(run_id).alias("run_id"),
            F.lit(table_family).alias("table_family"),
            "column_name",
            "addtnl_filter",
            "total_overlaps",
            "matches",
            "mismatches",
            F.lit(0).cast("bigint").alias("src_extras"),
            F.lit(0).cast("bigint").alias("tgt_extras"),
            F.lit("update").alias("op"),
        )
        tagged = tagged.unionByName(slices)
    table.merge(tagged, op_col="op")
