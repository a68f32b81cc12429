"""End-to-end validation pipeline: the reference's per-table-family
``trigger_validation`` sequence (migration-data-validation.py:1707-2000) as
one composable function over two DataFrames.

Stages (each optional via flags, mirroring the reference's strategy switch
at migration-data-validation.py:1860-1868):

1. schema capture + ordinal/name-type/compatibility checks,
2. quick validation (digest prefilter) OR full reconcile,
3. primary-key validation both sides,
4. per-column mismatch metrics + row-level mismatch capture + extras,
5. windowed per-date validation (when a date column is given),
6. summary status conjunction (validation_sqls.py:24-63).

Unlike the reference there is no f-string SQL, no staging-table writes, and
no driver thread pool: each report is a DataFrame the caller materializes or
persists; inter-stage parallelism comes from Spark, not threads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .checks import primary_key_validation, windowed_validation
from .quick import quick_validate
from .reconcile import (
    column_mismatch_metrics,
    extras,
    reconcile_counts,
    row_level_mismatches,
)
from .schema_check import (
    default_compatibility_matrix,
    name_type_check,
    ordinal_check,
    schema_store,
    type_compatibility,
)
from .summary import validation_summary


def run_validation(
    src: DataFrame,
    tgt: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    date_col: str | None = None,
    quick: bool = False,
) -> dict:
    """Run the full validation pipeline; returns a dict of report DataFrames
    plus the summary status dict under ``"summary"``."""
    spark = src.sparkSession
    if compare_cols is None:
        compare_cols = [
            c for c in src.columns if c in set(tgt.columns) and c not in key_cols
        ]

    src_store = schema_store(spark, src.schema, "src")
    tgt_store = schema_store(spark, tgt.schema, "tgt")
    ordinal = ordinal_check(src_store, tgt_store)
    name_type = name_type_check(src_store, tgt_store)
    compatibility = type_compatibility(
        name_type, default_compatibility_matrix(spark)
    )

    reports: dict = {
        "ordinal": ordinal,
        "name_type": name_type,
        "compatibility": compatibility,
        "reconcile_counts": reconcile_counts(src, tgt, key_cols, compare_cols),
        "column_metrics": column_mismatch_metrics(src, tgt, key_cols, compare_cols),
        "pk_src": primary_key_validation(src, key_cols),
        "pk_tgt": primary_key_validation(tgt, key_cols),
    }
    if quick:
        reports["quick"] = quick_validate(src, tgt, key_cols, compare_cols)
    else:
        reports["mismatch_rows"] = row_level_mismatches(
            src, tgt, key_cols, compare_cols
        )
        src_only, tgt_only = extras(src, tgt, key_cols)
        reports["src_extras_rows"] = src_only
        reports["tgt_extras_rows"] = tgt_only
    if date_col is not None:
        reports["windowed"] = windowed_validation(
            src, tgt, key_cols, date_col, compare_cols
        )

    reports["summary"] = validation_summary(
        reports["reconcile_counts"],
        reports["pk_src"],
        reports["pk_tgt"],
        reports["column_metrics"],
        name_type,
        ordinal,
        compatibility,
    )
    return reports
