"""Row-level reconciliation: the reference's hash-based quick validation and
full-outer comparison, re-expressed as single declarative Spark plans.

Reference semantics reproduced here:

- ``getHashAnomalies`` 4-way classification (matches / mismatches /
  src_extras / tgt_extras) from two (key, row_hash) digest sets —
  ``migration-data-validation.py:887-924``.  The reference runs one inner
  join, one theta join and two anti joins (4 shuffles) and caps re-fetch at
  1000 keys/side; we run ONE full outer join and derive all four classes
  from presence + hash equality, uncapped (SURVEY.md §4: the cap was a
  correctness-affecting workaround we drop).
- per-column match/mismatch counts — the reference issues 4 correlated
  scalar subqueries per column (``migration-data-validation.py:1156-1188``,
  O(cols × 4) passes); we compute every column's counters in ONE aggregation
  pass over the joined frame.
- extras via LEFT ANTI (``migration-data-validation.py:895-897``), row-level
  mismatches via EXCEPT ALL + join-back (``migration-data-validation.py:
  1313-1334``), full-outer report with _src/_tgt suffixes
  (``migration-data-validation.py:725-734, 766-832``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.digest import null_safe_string, row_digest, row_digest_pandas


def with_row_digest(
    df: DataFrame,
    cols: list[str] | None = None,
    name: str = "row_hash",
    use_pandas: bool = False,
) -> DataFrame:
    """Append a sha256 row digest over ``cols`` (default: all columns, sorted
    by name — the reference sorts mapped columns before hashing,
    databricks-extract.py:126-154)."""
    cols = sorted(df.columns) if cols is None else list(cols)
    fn = row_digest_pandas if use_pandas else row_digest
    return df.withColumn(name, fn(cols))


def hash_reconcile(
    src: DataFrame,
    tgt: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    use_pandas_digest: bool = False,
) -> DataFrame:
    """Classified digest comparison: one row per key present on either side.

    Output: key columns + src_hash + tgt_hash + status ∈
    {MATCH, MISMATCH, SRC_EXTRA, TGT_EXTRA}.  SRC_EXTRA = key only in src
    (missing in target); TGT_EXTRA = key only in tgt.
    """
    if compare_cols is None:
        compare_cols = sorted(set(src.columns) & set(tgt.columns) - set(key_cols))
    s = src.select(
        *key_cols, row_digest(compare_cols).alias("src_hash")
    ) if not use_pandas_digest else src.select(
        *key_cols, row_digest_pandas(compare_cols).alias("src_hash")
    )
    t = tgt.select(
        *key_cols, row_digest(compare_cols).alias("tgt_hash")
    ) if not use_pandas_digest else tgt.select(
        *key_cols, row_digest_pandas(compare_cols).alias("tgt_hash")
    )
    j = s.join(t, on=list(key_cols), how="full_outer")
    status = (
        F.when(F.col("src_hash").isNull(), F.lit("TGT_EXTRA"))
        .when(F.col("tgt_hash").isNull(), F.lit("SRC_EXTRA"))
        .when(F.col("src_hash") == F.col("tgt_hash"), F.lit("MATCH"))
        .otherwise(F.lit("MISMATCH"))
    )
    return j.withColumn("status", status)


def reconcile_counts(
    src: DataFrame,
    tgt: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Single-row summary: matches / mismatches / src_extras / tgt_extras."""
    rec = hash_reconcile(src, tgt, key_cols, compare_cols)
    return rec.agg(
        F.sum(F.when(F.col("status") == "MATCH", 1).otherwise(0)).alias("matches"),
        F.sum(F.when(F.col("status") == "MISMATCH", 1).otherwise(0)).alias("mismatches"),
        F.sum(F.when(F.col("status") == "SRC_EXTRA", 1).otherwise(0)).alias("src_extras"),
        F.sum(F.when(F.col("status") == "TGT_EXTRA", 1).otherwise(0)).alias("tgt_extras"),
    )


def extras(
    src: DataFrame, tgt: DataFrame, key_cols: list[str]
) -> tuple[DataFrame, DataFrame]:
    """(rows only in src, rows only in tgt) — LEFT ANTI both ways."""
    src_only = src.join(tgt.select(*key_cols), on=list(key_cols), how="left_anti")
    tgt_only = tgt.join(src.select(*key_cols), on=list(key_cols), how="left_anti")
    return src_only, tgt_only


def full_outer_report(
    src: DataFrame,
    tgt: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """The ``__full_outer`` report table: keys + ``<col>_src`` / ``<col>_tgt``
    pairs + per-row match flag (null-safe ``<=>`` compare, the reference's
    equality operator, migration-data-validation.py:1149-1155)."""
    if compare_cols is None:
        compare_cols = [
            c for c in src.columns if c in set(tgt.columns) and c not in key_cols
        ]
    s = src.select(*key_cols, *[F.col(c).alias(f"{c}_src") for c in compare_cols])
    t = tgt.select(*key_cols, *[F.col(c).alias(f"{c}_tgt") for c in compare_cols])
    j = s.join(t, on=list(key_cols), how="full_outer")
    all_match = None
    for c in compare_cols:
        eq = F.col(f"{c}_src").eqNullSafe(F.col(f"{c}_tgt"))
        all_match = eq if all_match is None else (all_match & eq)
    return j.withColumn("row_match", all_match if all_match is not None else F.lit(True))


def _unpivot_column_metrics(wide, compare_cols: list[str]):
    """Unpivot the 1-row wide per-column aggregate to (column_name, ...)
    rows.  ``stack(0, )`` is a parse error, so an EMPTY compare list (pure
    key-presence validation) returns a correctly-typed empty frame instead
    of crashing the pipeline."""
    if not compare_cols:
        return wide.select(
            F.lit(None).cast("string").alias("column_name"),
            "total_overlaps",
            F.lit(None).cast("long").alias("matches"),
            F.lit(None).cast("long").alias("mismatches"),
            "src_extras",
            "tgt_extras",
        ).limit(0)
    stack_items = ", ".join(
        f"'{c}', `__m__{c}`, `__x__{c}`" for c in compare_cols
    )
    return wide.select(
        F.expr(
            f"stack({len(compare_cols)}, {stack_items}) as (column_name, matches, mismatches)"
        ),
        "total_overlaps",
        "src_extras",
        "tgt_extras",
    ).select(
        "column_name", "total_overlaps", "matches", "mismatches",
        "src_extras", "tgt_extras",
    )


def column_mismatch_metrics(
    src: DataFrame,
    tgt: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-column counters in ONE pass: (column_name, total_overlaps,
    matches, mismatches, src_extras, tgt_extras).

    Replaces the reference's per-column scalar-subquery fan-out
    (migration-data-validation.py:1156-1188) with a single full-outer join +
    a single aggregation + an unpivot of the 1-row wide result.
    """
    if compare_cols is None:
        compare_cols = [
            c for c in src.columns if c in set(tgt.columns) and c not in key_cols
        ]
    # presence flags from a dedicated marker to survive all-null payloads
    s = src.select(*key_cols, F.lit(1).alias("__s"), *[F.col(c).alias(f"{c}_src") for c in compare_cols])
    t = tgt.select(*key_cols, F.lit(1).alias("__t"), *[F.col(c).alias(f"{c}_tgt") for c in compare_cols])
    j = s.join(t, on=list(key_cols), how="full_outer")
    both = F.col("__s").isNotNull() & F.col("__t").isNotNull()
    aggs = [
        F.sum(F.when(both, 1).otherwise(0)).alias("total_overlaps"),
        F.sum(F.when(F.col("__s").isNotNull() & F.col("__t").isNull(), 1).otherwise(0)).alias("src_extras"),
        F.sum(F.when(F.col("__s").isNull() & F.col("__t").isNotNull(), 1).otherwise(0)).alias("tgt_extras"),
    ]
    for c in compare_cols:
        eq = F.col(f"{c}_src").eqNullSafe(F.col(f"{c}_tgt"))
        aggs.append(F.sum(F.when(both & eq, 1).otherwise(0)).alias(f"__m__{c}"))
        aggs.append(F.sum(F.when(both & ~eq, 1).otherwise(0)).alias(f"__x__{c}"))
    wide = j.agg(*aggs)
    return _unpivot_column_metrics(wide, compare_cols)


def annotated_comparison(
    src: DataFrame,
    tgt: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    date_col: str | None = None,
) -> DataFrame:
    """ONE full-outer join carrying everything every downstream report
    needs: presence flags, per-column ``<col>_src``/``<col>_tgt`` value
    pairs, per-column null-safe equality bits, the 4-way status, and (when
    ``date_col`` is given) the coalesced date bucket.

    This is the pipeline's single shuffle of the src×tgt pair: reconcile
    counts, per-column metrics, row-level mismatches, extras both sides and
    windowed buckets are all narrow derivations of this frame (persist it
    once, derive many) — replacing the 5-6 independent full-outer/anti
    joins the reference's per-report SQL issues
    (migration-data-validation.py:887-924, 1156-1188, 1313-1384).

    Assumes ``key_cols`` is a primary key per side (the reference's
    contract; violations are surfaced separately by
    ``primary_key_validation``, which scans each input once without a join).
    """
    if compare_cols is None:
        compare_cols = [
            c for c in src.columns if c in set(tgt.columns) and c not in key_cols
        ]
    s_cols = [F.lit(1).alias("__s")] + [
        F.col(c).alias(f"{c}_src") for c in compare_cols
    ]
    t_cols = [F.lit(1).alias("__t")] + [
        F.col(c).alias(f"{c}_tgt") for c in compare_cols
    ]
    if date_col is not None:
        s_cols.append(F.to_date(F.col(date_col)).alias("__src_date"))
        t_cols.append(F.to_date(F.col(date_col)).alias("__tgt_date"))
    s = src.select(*key_cols, *s_cols)
    t = tgt.select(*key_cols, *t_cols)
    j = s.join(t, on=list(key_cols), how="full_outer")
    eq_cols = {
        f"__eq_{c}": F.col(f"{c}_src").eqNullSafe(F.col(f"{c}_tgt"))
        for c in compare_cols
    }
    j = j.withColumns(eq_cols)
    all_eq = F.lit(True)
    for c in compare_cols:
        all_eq = all_eq & F.col(f"__eq_{c}")
    status = (
        F.when(F.col("__s").isNull(), F.lit("TGT_EXTRA"))
        .when(F.col("__t").isNull(), F.lit("SRC_EXTRA"))
        .when(all_eq, F.lit("MATCH"))
        .otherwise(F.lit("MISMATCH"))
    )
    j = j.withColumn("status", status)
    if date_col is not None:
        j = j.withColumn(
            "bucket_date", F.coalesce("__src_date", "__tgt_date")
        ).drop("__src_date", "__tgt_date")
    return j


def counts_from_annotated(ann: DataFrame) -> DataFrame:
    """reconcile_counts derived from the annotated frame (no new join)."""
    return ann.agg(
        F.sum(F.when(F.col("status") == "MATCH", 1).otherwise(0)).alias("matches"),
        F.sum(F.when(F.col("status") == "MISMATCH", 1).otherwise(0)).alias("mismatches"),
        F.sum(F.when(F.col("status") == "SRC_EXTRA", 1).otherwise(0)).alias("src_extras"),
        F.sum(F.when(F.col("status") == "TGT_EXTRA", 1).otherwise(0)).alias("tgt_extras"),
    )


def column_metrics_from_annotated(
    ann: DataFrame, compare_cols: list[str]
) -> DataFrame:
    """column_mismatch_metrics derived from the annotated frame: one agg +
    an unpivot of the 1-row wide result."""
    both = F.col("__s").isNotNull() & F.col("__t").isNotNull()
    aggs = [
        F.sum(F.when(both, 1).otherwise(0)).alias("total_overlaps"),
        F.sum(F.when(F.col("status") == "SRC_EXTRA", 1).otherwise(0)).alias("src_extras"),
        F.sum(F.when(F.col("status") == "TGT_EXTRA", 1).otherwise(0)).alias("tgt_extras"),
    ]
    for c in compare_cols:
        eq = F.col(f"__eq_{c}")
        aggs.append(F.sum(F.when(both & eq, 1).otherwise(0)).alias(f"__m__{c}"))
        aggs.append(F.sum(F.when(both & ~eq, 1).otherwise(0)).alias(f"__x__{c}"))
    wide = ann.agg(*aggs)
    return _unpivot_column_metrics(wide, compare_cols)


def filter_condition_from_annotated(
    ann: DataFrame, expr_str: str | None, created_views: list[str] | None = None
):
    """Compile one ``addtnl_filters`` entry's SQL condition against the
    annotated frame (README.md:206-236: predicates are written over the
    suffixed ``<col>_src`` / ``<col>_tgt`` columns of the full-outer table).

    Returns a Column, or None for the reference's "N/A" sentinel (the
    unfiltered slice).  The reference's ``{full_outer_table}`` placeholder
    (a scalar subquery over the join table itself, MDV:1174-1180) is
    supported by registering the annotated frame as a temp view and letting
    the SQL parser resolve the subquery against it.  The view name is a
    content hash of the expression (deterministic across driver processes —
    Python's builtin ``hash`` is salted per process); it is appended to
    ``created_views`` so the caller can ``dropTempView`` once every frame
    that references the condition has been CONSTRUCTED — DataFrame analysis
    is eager, so the resolved plans no longer need the catalog entry."""
    if expr_str is None or expr_str.strip() in ("", "N/A"):
        return None
    if "{full_outer_table}" in expr_str:
        import hashlib

        digest = hashlib.sha256(expr_str.encode()).hexdigest()[:12]
        view = f"__full_outer_{digest}"
        ann.createOrReplaceTempView(view)
        if created_views is not None:
            created_views.append(view)
        expr_str = expr_str.replace("{full_outer_table}", view)
    return F.expr(expr_str)


def addtnl_filter_metrics_from_annotated(
    ann: DataFrame,
    compare_cols: list[str],
    filters: list[tuple[str, object]],
) -> DataFrame:
    """Per-slice per-column mismatch metrics from the annotated frame — the
    reference's ``addtnl_filters`` fan-out (README.md:206-236;
    migration-data-validation.py:1137-1188) in ONE aggregation pass.

    ``filters``: [(filter_name, condition Column | None)]; None = the "N/A"
    unfiltered slice.  The reference issues 4 correlated scalar subqueries
    per (filter × column) over the persisted full-outer table — O(F×C)
    scans; here every counter is a conditional SUM in a single aggregate
    job (F×(1+2C) counters), then an unpivot of the 1-row wide result.
    Slices count OVERLAP rows only (the reference's ``where_condition`` on
    the primary keys restricts to both-present rows — total_overlaps).

    Output: (addtnl_filter, column_name, total_overlaps, matches,
    mismatches), ordered.
    """
    if not filters or not compare_cols:
        return ann.sparkSession.createDataFrame(
            [],
            "addtnl_filter string, column_name string, total_overlaps bigint,"
            " matches bigint, mismatches bigint",
        )
    both = F.col("__s").isNotNull() & F.col("__t").isNotNull()
    aggs = []
    for i, (_name, cond) in enumerate(filters):
        base = both if cond is None else (both & cond)
        aggs.append(F.sum(F.when(base, 1).otherwise(0)).alias(f"__t{i}"))
        for c in compare_cols:
            eq = F.col(f"__eq_{c}")
            aggs.append(
                F.sum(F.when(base & eq, 1).otherwise(0)).alias(f"__m{i}__{c}")
            )
            aggs.append(
                F.sum(F.when(base & ~eq, 1).otherwise(0)).alias(f"__x{i}__{c}")
            )
    # ONE action on the (caller-persisted) annotated frame computes every
    # counter; the F×C unpivot happens driver-side on the single wide row —
    # a lazy per-slice union would instead re-run the aggregate once per
    # slice branch (union branches don't share the agg subplan).
    row = ann.agg(*aggs).first()
    out_rows = []
    for i, (name, _cond) in enumerate(filters):
        for c in compare_cols:
            out_rows.append(
                (
                    name,
                    c,
                    int(row[f"__t{i}"] or 0),
                    int(row[f"__m{i}__{c}"] or 0),
                    int(row[f"__x{i}__{c}"] or 0),
                )
            )
    return ann.sparkSession.createDataFrame(
        out_rows,
        "addtnl_filter string, column_name string, total_overlaps bigint,"
        " matches bigint, mismatches bigint",
    ).orderBy("addtnl_filter", "column_name")


def mismatch_rows_from_annotated(
    ann: DataFrame, key_cols: list[str], compare_cols: list[str]
) -> DataFrame:
    """row_level_mismatches derived from the annotated frame: filter
    MISMATCH, emit the src-side and tgt-side versions tagged by ``side``.
    Identical to the signed-count formulation when keys are unique."""
    bad = ann.filter(F.col("status") == "MISMATCH")
    s = bad.select(
        *key_cols,
        *[F.col(f"{c}_src").alias(c) for c in compare_cols],
        F.lit("src").alias("side"),
    )
    t = bad.select(
        *key_cols,
        *[F.col(f"{c}_tgt").alias(c) for c in compare_cols],
        F.lit("tgt").alias("side"),
    )
    return s.unionByName(t).orderBy(*key_cols, "side")


def extras_from_annotated(
    ann: DataFrame, key_cols: list[str], compare_cols: list[str]
) -> tuple[DataFrame, DataFrame]:
    """(src-only rows, tgt-only rows) derived from the annotated frame.
    Schema: key columns + compare columns of the surviving side."""
    src_only = ann.filter(F.col("status") == "SRC_EXTRA").select(
        *key_cols, *[F.col(f"{c}_src").alias(c) for c in compare_cols]
    )
    tgt_only = ann.filter(F.col("status") == "TGT_EXTRA").select(
        *key_cols, *[F.col(f"{c}_tgt").alias(c) for c in compare_cols]
    )
    return src_only, tgt_only


def windowed_from_annotated(ann: DataFrame) -> DataFrame:
    """windowed_validation derived from an annotated frame built with a
    ``date_col``: one groupBy on the already-joined rows."""
    return (
        ann.groupBy("bucket_date")
        .agg(
            F.sum(F.when(F.col("status") != "TGT_EXTRA", 1).otherwise(0)).alias("src_count"),
            F.sum(F.when(F.col("status") != "SRC_EXTRA", 1).otherwise(0)).alias("tgt_count"),
            F.sum(F.when(F.col("status") == "SRC_EXTRA", 1).otherwise(0)).alias("src_extras"),
            F.sum(F.when(F.col("status") == "TGT_EXTRA", 1).otherwise(0)).alias("tgt_extras"),
            F.sum(F.when(F.col("status") == "MISMATCH", 1).otherwise(0)).alias("mismatched_rows"),
        )
        .orderBy("bucket_date")
    )


def row_level_mismatches(
    src: DataFrame,
    tgt: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Full differing rows among overlapping keys, tagged by side.

    Semantics of the reference's two EXCEPT ALLs + join-back
    (migration-data-validation.py:1313-1334), computed as ONE signed-count
    aggregation: union src(+1)/tgt(-1) overlap rows, sum per full row, emit
    |sum| copies on the surplus side.  One shuffle instead of two EXCEPT-ALL
    rewrites — and it sidesteps a Spark 4.1 AQE exchange-reuse bug where the
    union of two mirrored exceptAll subplans returns wrong rows
    (ReusedExchange mis-resolution; observed on 4.1.2, see tests).
    """
    if compare_cols is None:
        compare_cols = [
            c for c in src.columns if c in set(tgt.columns) and c not in key_cols
        ]
    cols = list(key_cols) + list(compare_cols)
    s = (
        src.select(*cols)
        .join(tgt.select(*key_cols), on=list(key_cols), how="left_semi")
        .withColumn("__v", F.lit(1))
    )
    t = (
        tgt.select(*cols)
        .join(src.select(*key_cols), on=list(key_cols), how="left_semi")
        .withColumn("__v", F.lit(-1))
    )
    g = s.unionByName(t).groupBy(*cols).agg(F.sum("__v").alias("__d"))
    diff = g.filter(F.col("__d") != 0)
    out = diff.select(
        *cols,
        F.when(F.col("__d") > 0, F.lit("src")).otherwise(F.lit("tgt")).alias("side"),
        F.explode(F.sequence(F.lit(1), F.abs(F.col("__d")))).alias("__copy"),
    ).drop("__copy")
    return out.orderBy(*key_cols, "side")
