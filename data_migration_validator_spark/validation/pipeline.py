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

from .checks import primary_key_validation
from .quick import quick_validate
from .reconcile import (
    annotated_comparison,
    column_metrics_from_annotated,
    counts_from_annotated,
    extras_from_annotated,
    mismatch_rows_from_annotated,
    windowed_from_annotated,
)
from .schema_check import (
    default_compatibility_matrix,
    name_type_check,
    ordinal_check,
    schema_store,
    type_compatibility,
)
from .summary import summary_from_annotated


def run_validation(
    src: DataFrame,
    tgt: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    date_col: str | None = None,
    quick: bool = False,
) -> dict:
    """Run the full validation pipeline; returns a dict of report DataFrames
    plus the summary status dict under ``"summary"``.

    Cost model (the 100-TB shape): ONE full-outer join of src×tgt — the
    annotated frame, persisted under ``"annotated"`` — feeds reconcile
    counts, per-column metrics, row-level mismatches, extras both sides and
    windowed buckets as narrow derivations; PK validation scans each input
    once (agg only, no join); summary statuses come from one ``.collect()``
    of one cross-joined aggregate row.  The reference issues 5-6 independent
    src×tgt joins for the same reports (migration-data-validation.py:
    887-1384).  Callers that materialize many reports should leave the
    annotated frame persisted until done, then
    ``reports["annotated"].unpersist()``.
    """
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

    ann = annotated_comparison(src, tgt, key_cols, compare_cols, date_col).persist()
    pk_src = primary_key_validation(src, key_cols)
    pk_tgt = primary_key_validation(tgt, key_cols)

    reports: dict = {
        "annotated": ann,
        "ordinal": ordinal,
        "name_type": name_type,
        "compatibility": compatibility,
        "reconcile_counts": counts_from_annotated(ann),
        "column_metrics": column_metrics_from_annotated(ann, compare_cols),
        "pk_src": pk_src,
        "pk_tgt": pk_tgt,
    }
    if quick:
        reports["quick"] = quick_validate(src, tgt, key_cols, compare_cols)
    else:
        reports["mismatch_rows"] = mismatch_rows_from_annotated(
            ann, key_cols, compare_cols
        )
        src_only, tgt_only = extras_from_annotated(ann, key_cols, compare_cols)
        reports["src_extras_rows"] = src_only
        reports["tgt_extras_rows"] = tgt_only
    if date_col is not None:
        reports["windowed"] = windowed_from_annotated(ann)

    reports["summary"] = summary_from_annotated(
        ann, compare_cols, pk_src, pk_tgt, name_type, ordinal, compatibility
    )
    return reports
