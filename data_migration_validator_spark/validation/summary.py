"""Validation summary: the 8-status conjunction of the reference
(``validation_sqls.py:24-63``; evaluators ``validation_summary.py:253-618``).

Each status is SUCCESS/FAILED; ``validation_status`` is SUCCESS iff all are.
Computed driver-side from the check DataFrames' (tiny) aggregate results —
the expensive passes already happened inside the check functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _status(ok: bool) -> str:
    return "SUCCESS" if ok else "FAILED"


def summary_from_annotated(
    ann: DataFrame,
    compare_cols: list[str],
    pk_src: DataFrame,
    pk_tgt: DataFrame,
    name_type: DataFrame,
    ordinal: DataFrame,
    compatibility: DataFrame,
    mismatch_exclude_fields: list[str] | None = None,
) -> dict:
    """All summary statuses from ONE ``.collect()`` of ONE aggregated row.

    Cross-joins the 1-row aggregates (annotated-frame counters + per-column
    mismatch bits, both PK checks, schema-check failure counts) into a
    single plan, so the whole summary costs one Spark job instead of the
    eight the per-DataFrame evaluators issue.  The annotated frame should be
    persisted by the caller — this is one of its many derivations.

    ``mismatch_exclude_fields`` (reference ``validation_mapping.
    mismatch_exclude_fields``, README.md:199-205) feeds the separate
    ``mismatches_after_exclusion_status``: FAILED only when a NON-excluded
    column mismatches (``validation_summary.py:552-568``) — the excluded
    counter rides the same single aggregation, zero extra passes.  The
    ``comment_compare_status`` (SUM:361, 381-391) is folded in when the
    ``name_type`` frame carries a ``comment_compare`` column.
    """
    excluded = {c.lower() for c in (mismatch_exclude_fields or [])}
    aggs = [
        F.sum(F.when(F.col("status") == "MATCH", 1).otherwise(0)).alias("matches"),
        F.sum(F.when(F.col("status") == "MISMATCH", 1).otherwise(0)).alias("mismatches"),
        F.sum(F.when(F.col("status") == "SRC_EXTRA", 1).otherwise(0)).alias("src_extras"),
        F.sum(F.when(F.col("status") == "TGT_EXTRA", 1).otherwise(0)).alias("tgt_extras"),
    ]
    both = F.col("__s").isNotNull() & F.col("__t").isNotNull()
    bad_col = F.lit(0)
    bad_col_kept = F.lit(0)
    for c in compare_cols:
        bit = F.max(F.when(both & ~F.col(f"__eq_{c}"), 1).otherwise(0))
        bad_col = bad_col + bit
        if c.lower() not in excluded:
            bad_col_kept = bad_col_kept + bit
    aggs.append(bad_col.alias("mismatched_columns"))
    aggs.append(bad_col_kept.alias("mismatched_columns_kept"))
    wide = ann.agg(*aggs)

    pks = pk_src.select(F.col("pk_violations").alias("src_pk_violations"))
    pkt = pk_tgt.select(F.col("pk_violations").alias("tgt_pk_violations"))
    has_comments = "comment_compare" in name_type.columns
    nt_aggs = [
        F.sum(F.when(F.col("col_name_compare") == "MISMATCH", 1).otherwise(0)).alias("name_bad"),
        F.sum(F.when(F.col("datatype_compare") == "MISMATCH", 1).otherwise(0)).alias("dtype_bad"),
    ]
    if has_comments:
        nt_aggs.append(
            F.sum(
                F.when(F.col("comment_compare") == "MISMATCH", 1).otherwise(0)
            ).alias("comment_bad")
        )
    schema_counts = (
        name_type.agg(*nt_aggs)
        .crossJoin(
            ordinal.agg(
                F.sum(F.when(F.col("ordinal_compare") == "MISMATCH", 1).otherwise(0)).alias("ord_bad")
            )
        )
        .crossJoin(
            compatibility.agg(
                F.sum(F.when(~F.col("compatible"), 1).otherwise(0)).alias("compat_bad")
            )
        )
    )
    row = (
        wide.crossJoin(pks).crossJoin(pkt).crossJoin(schema_counts)
        .collect()[0]
        .asDict()
    )
    # empty frames aggregate to NULL sums/maxes
    for k in row:
        row[k] = row[k] or 0

    statuses = {
        "row_count_status": _status(row["src_extras"] == 0 and row["tgt_extras"] == 0),
        "hash_match_status": _status(
            row["mismatches"] == 0 and row["src_extras"] == 0 and row["tgt_extras"] == 0
        ),
        "data_mismatch_status": _status(row["mismatched_columns"] == 0),
        "mismatches_after_exclusion_status": _status(
            row["mismatched_columns_kept"] == 0
        ),
        "extras_status": _status(row["src_extras"] == 0 and row["tgt_extras"] == 0),
        "primary_key_compliance_status": _status(
            row["src_pk_violations"] == 0 and row["tgt_pk_violations"] == 0
        ),
        "column_names_status": _status(row["name_bad"] == 0),
        "ordinal_status": _status(row["ord_bad"] == 0),
        "datatype_compatibility_status": _status(row["compat_bad"] == 0),
    }
    if has_comments:
        statuses["comment_compare_status"] = _status(row["comment_bad"] == 0)
    # final conjunction mirrors the reference's read side (validation_sqls.
    # py:24-63): the AFTER-EXCLUSION mismatch status gates the final verdict
    # — the raw hash/data-mismatch statuses are reported but, with exclusions
    # configured, an expected mismatch in an excluded audit column must not
    # fail the run.  Without exclusions the two statuses coincide, so the
    # historical behavior is unchanged.
    gating = [
        k
        for k in statuses
        if k not in ("data_mismatch_status", "hash_match_status")
        or not excluded
    ]
    statuses["validation_status"] = _status(
        all(statuses[k] == "SUCCESS" for k in gating)
    )
    statuses.update(
        {
            "matches": row["matches"],
            "mismatches": row["mismatches"],
            "src_extras": row["src_extras"],
            "tgt_extras": row["tgt_extras"],
            "datatype_mismatch_columns": row["dtype_bad"],
        }
    )
    return statuses


def validation_summary(
    reconcile_counts_df: DataFrame,
    pk_src: DataFrame,
    pk_tgt: DataFrame,
    column_metrics: DataFrame,
    name_type: DataFrame,
    ordinal: DataFrame,
    compatibility: DataFrame,
    mismatch_exclude_fields: list[str] | None = None,
) -> dict:
    """Evaluate all statuses; returns a plain dict (one summary row).

    Mirrors the reference's evaluators:
    - row_count / extras / hash-match from the reconcile counts
      (validation_summary.py:58-117 row counts; 253-276 anomalies),
    - primary_key_compliance: count==count-distinct (SUM:263),
    - data_mismatch: count_if(mismatches != 0) over columns (SUM:552-568),
    - column_names / ordinal / datatype / compatibility (SUM:309-506).
    """
    rc = reconcile_counts_df.collect()[0].asDict()
    # empty inputs: aggregates over zero rows are NULL, and None == 0 is
    # False — two identical EMPTY tables would report FAILED everywhere and
    # persist_summary's int(None) would raise (summary_from_annotated
    # coalesces the same way)
    rc = {k: (0 if v is None else v) for k, v in rc.items()}
    pks = pk_src.collect()[0].asDict()
    pkt = pk_tgt.collect()[0].asDict()
    excluded = {c.lower() for c in (mismatch_exclude_fields or [])}
    col_bad = column_metrics.filter(F.col("mismatches") != 0).count()
    col_bad_kept = (
        column_metrics.filter(
            (F.col("mismatches") != 0)
            & ~F.lower(F.col("column_name")).isin(*excluded)
        ).count()
        if excluded
        else col_bad
    )
    name_bad = name_type.filter(
        (F.col("col_name_compare") == "MISMATCH")
    ).count()
    dtype_bad = name_type.filter(F.col("datatype_compare") == "MISMATCH").count()
    comment_bad = (
        name_type.filter(F.col("comment_compare") == "MISMATCH").count()
        if "comment_compare" in name_type.columns
        else None
    )
    ord_bad = ordinal.filter(F.col("ordinal_compare") == "MISMATCH").count()
    compat_bad = compatibility.filter(~F.col("compatible")).count()

    statuses = {
        "row_count_status": _status(rc["src_extras"] == 0 and rc["tgt_extras"] == 0),
        "hash_match_status": _status(rc["mismatches"] == 0 and rc["src_extras"] == 0 and rc["tgt_extras"] == 0),
        "data_mismatch_status": _status(col_bad == 0),
        "mismatches_after_exclusion_status": _status(col_bad_kept == 0),
        "extras_status": _status(rc["src_extras"] == 0 and rc["tgt_extras"] == 0),
        "primary_key_compliance_status": _status(
            pks["pk_violations"] == 0 and pkt["pk_violations"] == 0
        ),
        "column_names_status": _status(name_bad == 0),
        "ordinal_status": _status(ord_bad == 0),
        "datatype_compatibility_status": _status(compat_bad == 0),
    }
    if comment_bad is not None:
        statuses["comment_compare_status"] = _status(comment_bad == 0)
    gating = [
        k
        for k in statuses
        if k not in ("data_mismatch_status", "hash_match_status")
        or not excluded
    ]
    statuses["validation_status"] = _status(
        all(statuses[k] == "SUCCESS" for k in gating)
    )
    statuses.update(
        {
            "matches": rc["matches"],
            "mismatches": rc["mismatches"],
            "src_extras": rc["src_extras"],
            "tgt_extras": rc["tgt_extras"],
            "datatype_mismatch_columns": dtype_bad,
        }
    )
    return statuses
