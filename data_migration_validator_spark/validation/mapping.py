"""Config-driven multi-table validation: the reference's validation-mapping
model and fan-out.

The reference stores one row per (src, tgt) pair in ``validation_mapping``
(``conf/setup_validation_mapping.py:8-67``: table_family, src/tgt table,
'|'-separated ``tgt_primary_keys``, filter, date_bucket, quick_validation,
validation_is_active), resolves connections per pair
(``migration-data-validation.py:588-611``) and fans out over the active
pairs with a 30-thread driver pool (``migration-data-validation.py:
2173-2181``).

Here the mapping is a plain dataclass loaded from the same CSV shape
(S15 csv source), and the fan-out is a sequential driver loop — each
pair's pipeline is itself fully Spark-parallel, so driver threads add
contention, not throughput, on a shared cluster.  Outcomes persist through
``validation.store`` (summary + per-stage log + per-column metrics), so a
failed pair records FAILED + the exception text and the loop continues —
the reference's run-status machine (migration-data-validation.py:1756-1769).
"""

from __future__ import annotations

import time
import traceback
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake.table import LakeTable
from ..sources.files import csv_config_source
from .pipeline import run_validation
from .store import (
    persist_anomalies,
    persist_column_metrics,
    persist_log,
    persist_pk,
    persist_summary,
    persist_windowed,
)

MAPPING_CSV_SCHEMA = (
    "table_family string, src_table string, tgt_table string, "
    "key_cols string, compare_cols string, filter string, date_col string, "
    "quick_validation boolean, is_active boolean, col_mapping string, "
    "mismatch_exclude_fields string, addtnl_filters string"
)


@dataclass
class AddtnlFilter:
    """One named report slice (README.md:206-236 ``addtnl_filters`` entry):
    a SQL predicate over the full-outer frame's suffixed columns
    (``<col>_src`` / ``<col>_tgt``; ``{full_outer_table}`` refers to the
    frame itself), with per-slice mismatch capture opt-in."""

    filter_name: str
    filter: str | None = None  # None or "N/A" = the unfiltered slice
    capture_mismatches: bool = False


@dataclass
class TableMapping:
    """One configured validation pair (validation_mapping row analog).

    ``col_mapping`` — reference README.md:191-197: ``{src_col: tgt_col}``
    renames applied to the SOURCE side before comparison; ``key_cols`` /
    ``compare_cols`` / filters are written in TARGET naming.
    ``mismatch_exclude_fields`` — columns whose mismatches are expected;
    excluded from ``mismatches_after_exclusion_status`` (README.md:199-205).
    ``addtnl_filters`` — named report slices (README.md:206-236).
    """

    table_family: str
    src_table: str
    tgt_table: str
    key_cols: list[str]
    compare_cols: list[str] | None = None
    filter: str | None = None
    date_col: str | None = None
    quick: bool = False
    is_active: bool = True
    col_mapping: dict[str, str] | None = None
    mismatch_exclude_fields: list[str] | None = None
    addtnl_filters: list[AddtnlFilter] | None = None


def load_mappings_csv(spark: SparkSession, path: str) -> list[TableMapping]:
    """Mapping config from CSV (key lists '|'-separated, as the reference's
    ``tgt_primary_keys``, setup_validation_mapping.py:22-27; ``col_mapping``
    and ``addtnl_filters`` are JSON strings exactly as the reference's
    validation_mapping columns, README.md:191-236).  Config is tiny by
    definition — the collect is the config read, not a data scan."""
    import json

    rows = csv_config_source(spark, path, schema=MAPPING_CSV_SCHEMA).collect()
    out = []
    for r in rows:
        raw_cm = (r["col_mapping"] or "").strip()
        col_mapping = json.loads(raw_cm) if raw_cm and raw_cm != "{}" else None
        raw_af = (r["addtnl_filters"] or "").strip()
        addtnl = (
            [
                AddtnlFilter(
                    filter_name=e["filter_name"],
                    filter=e.get("filter"),
                    capture_mismatches=bool(e.get("capture_mismatches")),
                )
                for e in json.loads(raw_af)
            ]
            if raw_af
            else None
        )
        out.append(
            TableMapping(
                table_family=r["table_family"],
                src_table=r["src_table"],
                tgt_table=r["tgt_table"],
                key_cols=[k for k in (r["key_cols"] or "").split("|") if k],
                compare_cols=(
                    [c for c in r["compare_cols"].split("|") if c]
                    if r["compare_cols"]
                    else None
                ),
                filter=r["filter"] or None,
                date_col=r["date_col"] or None,
                quick=bool(r["quick_validation"]),
                is_active=r["is_active"] is not False,
                col_mapping=col_mapping,
                mismatch_exclude_fields=[
                    c for c in (r["mismatch_exclude_fields"] or "").split("|") if c
                ]
                or None,
                addtnl_filters=addtnl,
            )
        )
    return out


def resolve_connections(
    mapping_df: DataFrame, config_df: DataFrame
) -> DataFrame:
    """J5: resolve each mapping row's src/tgt connection details from the
    table-config table — the reference's double LEFT OUTER join
    (readValidationTableList, migration-data-validation.py:588-611) with
    the config side explicitly broadcast (it is a handful of connection
    rows joined against every configured pair).

    ``mapping_df`` needs ``src_connection_name``/``tgt_connection_name``;
    ``config_df`` is the ``table_config`` shape (DDLs.py:46-52):
    (connection_name, warehouse, jdbc_options, cast_to_string).
    """
    cfg = F.broadcast(config_df)
    src_cfg = cfg.select(
        F.col("connection_name").alias("src_connection_name"),
        F.col("warehouse").alias("src_warehouse"),
        F.col("jdbc_options").alias("src_jdbc_options"),
        F.col("cast_to_string").alias("src_cast_to_string"),
    )
    tgt_cfg = cfg.select(
        F.col("connection_name").alias("tgt_connection_name"),
        F.col("warehouse").alias("tgt_warehouse"),
        F.col("jdbc_options").alias("tgt_jdbc_options"),
    )
    return mapping_df.join(src_cfg, "src_connection_name", "left_outer").join(
        tgt_cfg, "tgt_connection_name", "left_outer"
    )


def run_mappings(
    spark: SparkSession,
    mappings: list[TableMapping],
    resolve: Callable[[str], DataFrame],
    run_id: str,
    summary_table: LakeTable | None = None,
    log_table: LakeTable | None = None,
    column_metrics_table: LakeTable | None = None,
    anomaly_table: LakeTable | None = None,
    windowed_table: LakeTable | None = None,
    pk_table: LakeTable | None = None,
    profile_table: LakeTable | None = None,
    bucket_short_circuit: int | None = None,
) -> dict[str, dict]:
    """Validate every active configured pair; returns {table_family: reports}.

    ``resolve(table_name)`` supplies the DataFrame for a configured table
    name (file path, catalog table, JDBC plan — source-agnostic).  Each
    pair: optional filter on both sides (declarative ``where``, per SURVEY
    §7.4 — never string-spliced into the source), full pipeline, then one
    summary upsert + one log batch + one metrics MERGE.
    """
    results: dict[str, dict] = {}
    for m in mappings:
        if not m.is_active:
            continue
        t0 = time.time()
        log_rows: list[dict] = []
        reports: dict = {}

        def _log(stage: str, status: str, message: str = "") -> None:
            log_rows.append(
                {
                    "run_id": run_id,
                    "table_family": m.table_family,
                    "stage": stage,
                    "status": status,
                    "message": message,
                    "event_time": time.time(),
                }
            )

        try:
            src = resolve(m.src_table)
            tgt = resolve(m.tgt_table)
            if m.col_mapping:
                # P1 rename map (README.md:191-197): source columns take
                # their target names BEFORE any filter/compare — key_cols,
                # compare_cols and filters are written in target naming.
                renamed = [m.col_mapping.get(c, c) for c in src.columns]
                dupes = sorted(
                    {n for n in renamed if renamed.count(n) > 1}
                )
                if dupes:
                    # a mapped target name colliding with an unmapped source
                    # column would silently duplicate the column and make
                    # every later reference ambiguous — fail loud at config
                    raise ValueError(
                        f"col_mapping for {m.table_family!r} produces "
                        f"duplicate column name(s) {dupes}: each mapped "
                        "target name must not collide with another "
                        "(mapped or unmapped) source column"
                    )
                src = src.select(
                    *[
                        F.col(c).alias(m.col_mapping.get(c, c))
                        for c in src.columns
                    ]
                )
            if m.filter:
                src = src.where(m.filter)
                tgt = tgt.where(m.filter)
            _log("resolve", "SUCCESS", f"{m.src_table} vs {m.tgt_table}")

            reports = run_validation(
                src,
                tgt,
                key_cols=m.key_cols,
                compare_cols=m.compare_cols,
                date_col=m.date_col,
                quick=m.quick,
                bucket_short_circuit=bucket_short_circuit,
                mismatch_exclude_fields=m.mismatch_exclude_fields,
                addtnl_filters=m.addtnl_filters,
            )
            summary = reports["summary"]
            _log("validate", summary["validation_status"])
            results[m.table_family] = reports

            if summary_table is not None:
                persist_summary(
                    summary_table,
                    run_id,
                    m.table_family,
                    summary,
                    src_table=m.src_table,
                    tgt_table=m.tgt_table,
                    quick=m.quick,
                    started_at=t0,
                    finished_at=time.time(),
                )
                _log("persist_summary", "SUCCESS")
            if column_metrics_table is not None:
                persist_column_metrics(
                    column_metrics_table,
                    run_id,
                    m.table_family,
                    reports["column_metrics"],
                    addtnl_metrics=reports.get("addtnl_filter_metrics"),
                )
                _log("persist_metrics", "SUCCESS")
            if anomaly_table is not None and "annotated" in reports:
                cmp_cols = m.compare_cols or [
                    c
                    for c in src.columns
                    if c in set(tgt.columns) and c not in m.key_cols
                ]
                persist_anomalies(
                    anomaly_table,
                    run_id,
                    m.table_family,
                    reports["annotated"],
                    m.key_cols,
                    cmp_cols,
                )
                _log("persist_anomalies", "SUCCESS")
            if windowed_table is not None and "windowed" in reports:
                persist_windowed(
                    windowed_table, run_id, m.table_family, reports["windowed"]
                )
                _log("persist_windowed", "SUCCESS")
            if pk_table is not None:
                persist_pk(
                    pk_table,
                    run_id,
                    m.table_family,
                    reports["pk_src"],
                    reports["pk_tgt"],
                )
                _log("persist_pk", "SUCCESS")
            if profile_table is not None:
                # HLL single-pass profile per side (validation/profile.py);
                # persisted snapshots make cross-RUN drift a read-back diff
                # (report.profile_drift), no rescan of historical loads
                from .profile import profile_columns
                from .store import persist_profile

                persist_profile(
                    profile_table, run_id, m.table_family, "src",
                    profile_columns(src),
                )
                persist_profile(
                    profile_table, run_id, m.table_family, "tgt",
                    profile_columns(tgt),
                )
                _log("persist_profile", "SUCCESS")
        except Exception as exc:  # record FAILED + exception, keep going
            # distinct stage name: a persist step can fail AFTER a successful
            # _log("validate", ...), and two rows with the same (run_id,
            # table_family, stage) key in one merge batch would violate the
            # MERGE's pre-deduped contract.
            _log("error", "FAILED", f"{exc}\n{traceback.format_exc(limit=3)}")
            if summary_table is not None:
                persist_summary(
                    summary_table,
                    run_id,
                    m.table_family,
                    {"validation_status": "FAILED"},
                    src_table=m.src_table,
                    tgt_table=m.tgt_table,
                    quick=m.quick,
                    started_at=t0,
                    finished_at=time.time(),
                )
        finally:
            # free the per-mapping annotated cache: a config run over dozens
            # of table families would otherwise pin one src×tgt-sized frame
            # per family for the session lifetime
            if "annotated" in reports:
                reports["annotated"].unpersist()
            if log_table is not None:
                persist_log(log_table, log_rows)
    return results
