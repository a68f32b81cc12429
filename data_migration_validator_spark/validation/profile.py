"""Column profiling and aggregate-level table comparison.

``profile_columns`` computes per-column statistics (rows, nulls, distinct,
typed min/max) for a whole table; ``profile_compare`` diffs two profiles.
Together they are the ZERO-JOIN validation tier: at 100 TB a full-outer
row reconcile shuffles both tables, while a profile compare is one scan of
each side and a driver-side diff of a few hundred scalar rows — the right
first gate before paying for row-level checks (reference's summary-first
flow, migration-data-validation.py:700-780, generalized to every column).

Plan shape: all non-distinct statistics fold into ONE aggregation pass
(map-side partial, one-row exchange).  Distinct counts:

- ``exact_distinct=False`` (default): ``approx_count_distinct`` (HLL++,
  rsd 0.02) rides the SAME single pass — no Expand, mergeable sketches,
  (rsd 0.02, not tighter: Spark's HLL++ register count — and with it the
  per-task sketch memory traffic — grows ~12x between rsd 0.02 and 0.01,
  measured 2.3s vs 7.7s for a 16-column lineitem profile on this box;
  2% relative error is far inside any drift gate that consumes these),
  the 100-TB mode;
- ``exact_distinct=True``: exact ``count_distinct`` per column makes
  Catalyst plan an Expand (input × #columns rows through one shuffle) —
  affordable at test scale, what the DuckDB oracle checks.

min/max are emitted into TYPE-SAFE slots — (min_num, max_num) for numeric
columns, (min_str, max_str) for strings, (min_ts, max_ts) for date/time —
so the report needs no lossy cast-to-string of doubles or timestamps
(min/max are order-insensitive exact values; a string rendering would be
engine-dependent).  Columns of other types (arrays, binary, …) profile
rows/nulls/distinct only.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_TIME = (T.TimestampType, T.TimestampNTZType, T.DateType)

_PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("column", T.StringType(), False),
        T.StructField("dtype", T.StringType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("n_nulls", T.LongType(), False),
        T.StructField("n_distinct", T.LongType(), False),
        T.StructField("min_num", T.DoubleType(), True),
        T.StructField("max_num", T.DoubleType(), True),
        T.StructField("min_str", T.StringType(), True),
        T.StructField("max_str", T.StringType(), True),
        T.StructField("min_ts", T.TimestampType(), True),
        T.StructField("max_ts", T.TimestampType(), True),
    ]
)


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """One profile row per column: (column, dtype, n_rows, n_nulls,
    n_distinct, min_num, max_num, min_str, max_str, min_ts, max_ts).
    ``n_distinct`` counts non-null values (SQL COUNT(DISTINCT col)).
    """
    spark: SparkSession = df.sparkSession
    names = cols or df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    unknown = [c for c in names if c not in fields]
    if unknown:
        raise ValueError(f"unknown columns: {unknown}")

    aggs = [F.count(F.lit(1)).alias("__rows")]
    for i, c in enumerate(names):
        col = F.col(c)
        aggs.append(
            F.sum(col.isNull().cast("bigint")).alias(f"__n{i}")
        )
        aggs.append(
            (F.count_distinct(col) if exact_distinct
             else F.approx_count_distinct(col, rsd=0.02))
            .cast("bigint").alias(f"__d{i}")
        )
        dt = fields[c]
        if isinstance(dt, _NUMERIC):
            aggs.append(F.min(col).cast("double").alias(f"__lo{i}"))
            aggs.append(F.max(col).cast("double").alias(f"__hi{i}"))
        elif isinstance(dt, T.StringType):
            aggs.append(F.min(col).alias(f"__lo{i}"))
            aggs.append(F.max(col).alias(f"__hi{i}"))
        elif isinstance(dt, _TIME):
            aggs.append(F.min(col).cast("timestamp").alias(f"__lo{i}"))
            aggs.append(F.max(col).cast("timestamp").alias(f"__hi{i}"))

    row = df.agg(*aggs).first()
    total = int(row["__rows"])
    out = []
    for i, c in enumerate(names):
        dt = fields[c]
        lo = row[f"__lo{i}"] if f"__lo{i}" in row.__fields__ else None
        hi = row[f"__hi{i}"] if f"__hi{i}" in row.__fields__ else None
        num = isinstance(dt, _NUMERIC)
        s = isinstance(dt, T.StringType)
        ts = isinstance(dt, _TIME)
        out.append(
            (
                c, dt.simpleString(), total,
                int(row[f"__n{i}"] or 0), int(row[f"__d{i}"] or 0),
                lo if num else None, hi if num else None,
                lo if s else None, hi if s else None,
                lo if ts else None, hi if ts else None,
            )
        )
    return spark.createDataFrame(out, _PROFILE_SCHEMA)


def profile_quantiles(
    df: DataFrame,
    cols: list[str],
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    exact: bool = True,
) -> DataFrame:
    """Per-column quantiles, all columns and probabilities in ONE
    aggregation pass (map-side partial, one-row exchange) — the
    distribution tier between min/max profiling and full histograms.

    ``exact=True``: ``percentile`` (exact linear interpolation, the
    standard ``quantile_cont`` definition any SQL engine can re-check —
    the oracle mode; needs a per-column sort inside the aggregate, fine
    at validation-sample scale).  ``exact=False``: ``percentile_approx``
    (mergeable sketch, single pass, bounded memory — the 100-TB mode).
    Returns (column, p, value) rows.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    bad = [c for c in cols if not isinstance(fields.get(c), _NUMERIC)]
    if bad:
        raise ValueError(f"non-numeric (or unknown) columns: {bad}")
    if not cols or not probs:
        raise ValueError("need at least one column and one probability")
    ps = [float(p) for p in probs]
    parr = F.array(*[F.lit(p) for p in ps])
    aggs = []
    for i, c in enumerate(cols):
        col = F.col(c).cast("double")
        aggs.append(
            (F.percentile(col, parr) if exact
             else F.percentile_approx(col, parr, 10_000)).alias(f"__q{i}")
        )
    row = df.agg(*aggs).first()
    out = []
    for i, c in enumerate(cols):
        vals = row[f"__q{i}"] or [None] * len(ps)
        out.extend((c, p, v) for p, v in zip(ps, vals))
    return df.sparkSession.createDataFrame(
        out, "column string, p double, value double"
    )


_METRICS = (
    "n_rows", "n_nulls", "n_distinct",
    "min_num", "max_num", "min_str", "max_str", "min_ts", "max_ts",
)


def _differs(va, vb) -> bool:
    """Python `!=` with one exception: NaN on BOTH sides is agreement (a
    double column whose max is NaN on both sides must not flag forever)."""
    if (
        isinstance(va, float) and isinstance(vb, float)
        and math.isnan(va) and math.isnan(vb)
    ):
        return False
    return va != vb


def profile_compare(
    src: DataFrame,
    tgt: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = True,
    distinct_rtol: float = 0.0,
) -> DataFrame:
    """Diff two tables by their column profiles: one row per (column,
    metric) that DIFFERS, with both sides rendered as strings — empty
    result means the profiles agree.  Cost: one scan per side, no join of
    the data (the diff runs over 2×#columns profile rows).

    ``distinct_rtol``: with approximate distinct counts (the 100-TB mode),
    treat n_distinct values within this relative tolerance as equal —
    e.g. 0.05 for the default rsd 0.02 sketches (two snapshots each
    ±2% can legitimately differ ~4%).  Ignored (use 0.0) with
    ``exact_distinct=True``.
    """
    shared = cols or [c for c in src.columns if c in set(tgt.columns)]
    p_s = {r["column"]: r for r in
           profile_columns(src, shared, exact_distinct).collect()}
    p_t = {r["column"]: r for r in
           profile_columns(tgt, shared, exact_distinct).collect()}
    out = []
    for c in shared:
        a, b = p_s[c], p_t[c]
        for m in _METRICS:
            va, vb = a[m], b[m]
            if m == "n_distinct" and distinct_rtol > 0:
                base = max(abs(va or 0), abs(vb or 0), 1)
                if abs((va or 0) - (vb or 0)) / base <= distinct_rtol:
                    continue
            if _differs(va, vb):
                out.append((c, m, str(va), str(vb)))
    return src.sparkSession.createDataFrame(
        out,
        T.StructType(
            [
                T.StructField("column", T.StringType(), False),
                T.StructField("metric", T.StringType(), False),
                T.StructField("src_value", T.StringType(), True),
                T.StructField("tgt_value", T.StringType(), True),
            ]
        ),
    )
