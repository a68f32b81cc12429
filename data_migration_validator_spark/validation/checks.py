"""Aggregate validation checks: PK compliance, windowed per-date counts,
timeline min/max — reference ``migration-data-validation.py:1366-1483``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .reconcile import hash_reconcile


def primary_key_validation(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """count vs count-distinct on the composite key
    (migration-data-validation.py:1444-1447).  Single-row result:
    (total_count, distinct_count, pk_violations)."""
    return df.agg(
        F.count(F.lit(1)).alias("total_count"),
        F.count_distinct(*[F.col(k) for k in key_cols]).alias("distinct_count"),
        (
            F.count(F.lit(1)) - F.count_distinct(*[F.col(k) for k in key_cols])
        ).alias("pk_violations"),
    )


def windowed_validation(
    src: DataFrame,
    tgt: DataFrame,
    key_cols: list[str],
    date_col: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-date-bucket counts of the six row classes the reference inserts
    into ``windowed_validation_metrics`` (migration-data-validation.py:
    1366-1384): src/tgt row counts, extras both sides, mismatches both sides
    — computed in ONE reconcile pass + ONE aggregation instead of six insert
    statements.

    Output: (bucket_date, src_count, tgt_count, src_extras, tgt_extras,
    mismatched_rows).
    """
    s = src.withColumn("__src_date", F.to_date(F.col(date_col)))
    t = tgt.withColumn("__tgt_date", F.to_date(F.col(date_col)))
    if compare_cols is None:
        compare_cols = sorted(
            (set(src.columns) & set(tgt.columns)) - set(key_cols)
        )
    rec = hash_reconcile(s, t, key_cols, compare_cols)
    # NULL-SAFE joins throughout: a row with a NULL key survives
    # hash_reconcile as an extra, but plain equi-joins would drop it here,
    # making the windowed totals disagree with reconcile_counts.  Frames
    # are explicitly aliased — src/tgt often derive from the same source,
    # and unqualified self-join columns are ambiguous.
    from functools import reduce

    def _ns(la, ra):
        return reduce(
            lambda a, b: a & b,
            [
                F.col(f"{la}.{k}").eqNullSafe(F.col(f"{ra}.{k}"))
                for k in key_cols
            ],
        )

    sdf = s.select(*key_cols, "__src_date").alias("__wsrc")
    tdf = t.select(*key_cols, "__tgt_date").alias("__wtgt")
    dates = sdf.join(tdf, _ns("__wsrc", "__wtgt"), "full_outer").select(
        *[
            F.coalesce(F.col(f"__wsrc.{k}"), F.col(f"__wtgt.{k}")).alias(k)
            for k in key_cols
        ],
        F.coalesce("__src_date", "__tgt_date").alias("bucket_date"),
    ).alias("__wdat")
    j = rec.alias("__wrec").join(
        dates, _ns("__wrec", "__wdat"), "inner"
    ).select(F.col("__wdat.bucket_date"), F.col("__wrec.status"))
    return (
        j.groupBy("bucket_date")
        .agg(
            F.sum(F.when(F.col("status") != "TGT_EXTRA", 1).otherwise(0)).alias("src_count"),
            F.sum(F.when(F.col("status") != "SRC_EXTRA", 1).otherwise(0)).alias("tgt_count"),
            F.sum(F.when(F.col("status") == "SRC_EXTRA", 1).otherwise(0)).alias("src_extras"),
            F.sum(F.when(F.col("status") == "TGT_EXTRA", 1).otherwise(0)).alias("tgt_extras"),
            F.sum(F.when(F.col("status") == "MISMATCH", 1).otherwise(0)).alias("mismatched_rows"),
        )
        .orderBy("bucket_date")
    )


def timeline(df: DataFrame, date_col: str) -> DataFrame:
    """min/max date bucket (migration-data-validation.py:1386-1398)."""
    return df.agg(
        F.min(F.to_date(F.col(date_col))).alias("min_date"),
        F.max(F.to_date(F.col(date_col))).alias("max_date"),
    )
