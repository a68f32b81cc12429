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

# Mirrors the reference's read-side AND-fold membership exactly
# (validation_sqls.py:24-63): the AFTER-EXCLUSION mismatch status gates the
# final verdict — the raw data_mismatch/hash_match statuses are stored and
# reported but must not fail a run whose only mismatches sit in configured
# ``mismatch_exclude_fields``; comment_compare joins the conjunction per
# VSQL:45.  Without exclusions, after-exclusion == data_mismatch and
# (mismatches ∨ extras) == hash_match, so the fold is unchanged.
_CONJUNCTION_COLS = [
    "row_count_status",
    "mismatches_after_exclusion_status",
    "comment_compare_status",
    "extras_status",
    "primary_key_compliance_status",
    "column_names_status",
    "ordinal_status",
    "datatype_compatibility_status",
]


# Summary tables persisted before these checks existed lack their columns;
# NULL-is-FAILED over a column that was never written would retroactively
# flip every historical run to FAILED.  Each legacy fallback says what the
# old store DID gate on for the same failure mode (after-exclusion ==
# data_mismatch when no exclusions are configured — exactly the pre-change
# semantics); a check with no legacy analog (comment compare) simply never
# ran and must not gate.
_LEGACY_FALLBACK = {
    "mismatches_after_exclusion_status": "data_mismatch_status",
    "comment_compare_status": None,  # no pre-change analog: skip the gate
}


def summary_conjunction(summary: DataFrame) -> DataFrame:
    """Re-derive the final status from the persisted per-check columns with
    the reference's NULL-is-FAILED rule (validation_sqls.py:24-63) — the
    stored ``validation_status`` is written by the run; this is the read
    side's independent conjunction over what actually landed.  Columns a
    pre-change store never wrote fold through their legacy fallback
    (``_LEGACY_FALLBACK``) instead of NULL-failing history."""
    have = set(summary.columns)
    ok = F.lit(True)
    out_cols: list = []
    for c in _CONJUNCTION_COLS:
        gate = c
        if c not in have:
            gate = _LEGACY_FALLBACK.get(c, c)
            out_cols.append(F.lit(None).cast("string").alias(c))
        else:
            out_cols.append(F.col(c))
        if gate is None or gate not in have:
            continue  # check never ran in this store generation: no gate
        ok = ok & F.when(
            F.col(gate).isNull() | (F.col(gate) == "FAILED"), F.lit(False)
        ).otherwise(F.lit(True))
    return summary.select(
        "run_id",
        "table_family",
        "src_table",
        "tgt_table",
        F.when(ok, F.lit("SUCCESS")).otherwise(F.lit("FAILED")).alias(
            "final_validation_status"
        ),
        *out_cols,
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
    if "addtnl_filter" in df.columns:
        # base metrics only: slice rows re-count the same mismatches per
        # configured filter and would double-rank a column
        df = df.filter(F.col("addtnl_filter") == "N/A")
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


def dq_failures(dq: DataFrame, run_id: str | None = None) -> DataFrame:
    """FAILED contract rules from the persisted dq_results table
    (store.make_dq_table), worst first — the ops view after a load."""
    out = dq.filter(F.col("status") == "FAIL")
    if run_id is not None:
        out = out.filter(F.col("run_id") == run_id)
    return out.select(
        "run_id", "table_family", "side", "rule", "kind", "target",
        "violations", "total",
    ).orderBy(F.col("violations").desc(), "rule")


def profile_drift(
    profiles: DataFrame,
    run_a: str,
    run_b: str,
    table_family: str | None = None,
    side: str = "tgt",
    distinct_rtol: float = 0.05,
) -> DataFrame:
    """Cross-RUN drift from the persisted column_profiles table
    (store.make_profile_table): one row per (table_family, column, metric)
    whose value changed between ``run_a`` and ``run_b`` — yesterday's load
    vs today's as a read-back join of two tiny profile slices, no rescan
    of either table.  Values render as strings so every metric type shares
    one report column.

    ``distinct_rtol``: the persisted snapshots come from HLL
    approx_count_distinct (run_mappings persists rsd-0.02 sketches), so
    exact equality on ``n_distinct`` would flag estimation jitter as
    drift; values within this relative tolerance are treated equal —
    mirroring profile_compare.  Set 0.0 for exact-count snapshots."""
    from .profile import _METRICS

    # single source of truth: a metric added to the profiler must reach
    # this cross-run report without a second edit
    metrics = list(_METRICS)
    base = profiles.filter(F.col("side") == side)
    if table_family is not None:
        base = base.filter(F.col("table_family") == table_family)

    def _slice(run: str, tag: str) -> DataFrame:
        return base.filter(F.col("run_id") == run).select(
            "table_family", "column",
            *[F.col(m).cast("string").alias(f"{tag}_{m}") for m in metrics],
        )

    joined = _slice(run_a, "a").join(
        _slice(run_b, "b"), on=["table_family", "column"], how="full_outer"
    )
    def _changed(m: str):
        a, b = F.col(f"a_{m}"), F.col(f"b_{m}")
        if m == "n_distinct" and distinct_rtol > 0:
            an, bn = a.cast("double"), b.cast("double")
            base_v = F.greatest(F.abs(an), F.abs(bn), F.lit(1.0))
            within = (F.abs(an - bn) / base_v) <= F.lit(distinct_rtol)
            # NULL on either side (column appeared/vanished) is real drift
            return ~F.coalesce(within, a.eqNullSafe(b))
        return ~a.eqNullSafe(b)

    legs = [
        joined.select(
            "table_family", "column", F.lit(m).alias("metric"),
            F.col(f"a_{m}").alias("value_a"), F.col(f"b_{m}").alias("value_b"),
        ).filter(_changed(m))
        for m in metrics
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("table_family", "column", "metric")
