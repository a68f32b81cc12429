"""Projection operators (SURVEY §2.2 P1-P4, P6).

The reference builds these as f-string select-lists; here they are
DataFrame projections (no string splicing, Catalyst prunes through them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the reference's missing-column sentinels (migration-data-validation.py:
# 1487-1537) — a mapped column absent on one side projects as this literal
# so the full-outer compare flags every row rather than erroring.
MISSING_SRC = "THIS COLUMN DOES NOT EXIST IN SRC"
MISSING_TGT = "THIS COLUMN DOES NOT EXIST IN TGT"


def mapped_projection(
    df: DataFrame,
    columns: list[str],
    col_mapping: dict[str, str] | None = None,
    sentinel: str = MISSING_SRC,
) -> DataFrame:
    """P1: project ``columns`` applying rename mapping; columns missing from
    ``df`` become the sentinel literal (generate_src_alias/generate_tgt_alias,
    migration-data-validation.py:1487-1537)."""
    mapping = col_mapping or {}
    have = set(df.columns)
    proj = []
    for c in columns:
        src_name = mapping.get(c, c)
        if src_name in have:
            proj.append(F.col(src_name).alias(c))
        else:
            proj.append(F.lit(sentinel).alias(c))
    return df.select(*proj)


def suffix_projection(df: DataFrame, key_cols: list[str], suffix: str) -> DataFrame:
    """P2: keys unchanged, payload columns renamed ``<col><suffix>``
    (generate_col_list/generate_col_suffix, migration-data-validation.py:
    725-734, 874-883)."""
    return df.select(
        *key_cols,
        *[F.col(c).alias(f"{c}{suffix}") for c in df.columns if c not in key_cols],
    )


def cast_all_to_string(df: DataFrame) -> DataFrame:
    """P3: normalize every column to STRING (databricks-extract.py:254-257)."""
    return df.select(*[F.col(c).cast("string").alias(c) for c in df.columns])


def null_safe_string_projection(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """P4: ``COALESCE(CAST(c AS STRING), '') AS c`` sorted by name
    (processDatabricksColNames, databricks-extract.py:126-154)."""
    cols = sorted(df.columns if columns is None else columns)
    return df.select(
        *[F.coalesce(F.col(c).cast("string"), F.lit("")).alias(c) for c in cols]
    )


def column_union(src_cols: list[str], tgt_cols: list[str]) -> list[str]:
    """W3: merge two ordered column lists, first-seen wins, order preserved.

    The reference computes this with SHOW COLUMNS → monotonically_increasing
    id → union → row_number window → collect (create_normailzed_views,
    migration-data-validation.py:1554-1568) — a 4-stage Spark job for a
    driver-sized list.  Schema lists are metadata: plain Python is the right
    altitude, and the Spark-window form for data-scale inputs is
    :func:`first_seen_union`."""
    seen: set[str] = set()
    out: list[str] = []
    for c in list(src_cols) + list(tgt_cols):
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out


def first_seen_union(
    a: DataFrame, b: DataFrame, dedup_col: str, order_cols: list[str]
) -> DataFrame:
    """W3 at data scale: union two frames, keep the first-seen row per
    ``dedup_col`` — rows from ``a`` outrank rows from ``b``, then by
    ``order_cols``.  One window, one shuffle."""
    from pyspark.sql import Window

    u = a.withColumn("__side", F.lit(0)).unionByName(
        b.withColumn("__side", F.lit(1))
    )
    w = Window.partitionBy(dedup_col).orderBy("__side", *order_cols)
    return (
        u.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__side")
    )


def exclude_metadata_columns(
    df: DataFrame, suffixes: tuple[str, ...] = ("__mmp",)
) -> DataFrame:
    """P6: drop engine-metadata columns by suffix (migration-data-validation.py:
    1112-1126)."""
    keep = [c for c in df.columns if not any(c.endswith(s) for s in suffixes)]
    return df.select(*keep)
