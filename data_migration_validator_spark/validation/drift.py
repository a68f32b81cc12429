"""Distribution drift between two tables: equi-width histograms + PSI/KS.

Row-level reconcile says WHICH rows differ; profile compare says whether
aggregates moved; this module says whether a column's DISTRIBUTION moved —
the check that catches "every row present but the values re-scaled"
migration bugs (unit changes, truncation, timezone shifts) that min/max
and counts can miss.

Scale shape: histograms are the cheapest distributional statistic Spark
can compute — ``width_bucket`` is a codegen scalar, the per-column rollup
is a partial-aggregated groupBy on ≤ (n_buckets+2) × #columns keys, so the
shuffle moves a few hundred rows however big the table is.  All requested
columns share ONE scan and ONE shuffle via an inline (column, bucket)
expansion (map-side combine collapses it before the exchange).  PSI and KS
run driver-side on the collected histogram rows — scalar bookkeeping, same
altitude as ``validation.summary``.

Bucket semantics are SQL ``width_bucket(x, lo, hi, n)``: bucket 0 =
underflow (x < lo), n+1 = overflow (x ≥ hi), NULL values land in a
NULL-bucket row so nothing is silently dropped.  The bucket id is computed
with an EXPLICIT ``floor((x - lo) / (hi - lo) * n) + 1`` expression rather
than an engine built-in, so any engine evaluating the same IEEE-double
operation order (DuckDB for the oracle) buckets boundary values
identically.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def histogram(
    df: DataFrame,
    cols: dict[str, tuple[float, float]],
    n_buckets: int = 20,
) -> DataFrame:
    """Equi-width histograms for several numeric columns in ONE pass.

    ``cols`` maps column name → (lo, hi) bounds (fix the bounds explicitly
    so two engines/sides bucket identically; take them from
    ``profile_columns`` when unknown).  Returns (column, bucket, n) with
    ``width_bucket`` semantics; ``bucket`` NULL counts the column's NULLs.
    """
    if not cols:
        raise ValueError("cols must name at least one column")
    def _bucket(c: str, lo: float, hi: float):
        if not hi > lo:
            raise ValueError(f"{c}: hi must exceed lo, got [{lo}, {hi})")
        x = F.col(c).cast("double")
        raw = F.floor(
            (x - F.lit(float(lo)))
            / F.lit(float(hi) - float(lo))
            * F.lit(float(n_buckets))
        ) + F.lit(1)
        return (
            F.when(x.isNull(), F.lit(None).cast("bigint"))
            .when(x < F.lit(float(lo)), F.lit(0))
            .when(x >= F.lit(float(hi)), F.lit(n_buckets + 1))
            .otherwise(raw)
            .cast("bigint")
        )

    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                _bucket(c, lo, hi).alias("bucket"),
            )
            for c, (lo, hi) in cols.items()
        ]
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.column").alias("column"),
            F.col("p.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _collect_hist(hist_rows, column: str, n_buckets: int) -> list[int]:
    """Dense [0 .. n_buckets+1] count vector (NULL bucket excluded — NULL
    incidence is a completeness question, not a shape question)."""
    dense = [0] * (n_buckets + 2)
    for r in hist_rows:
        if r["column"] == column and r["bucket"] is not None:
            dense[int(r["bucket"])] = int(r["n"])
    return dense


def psi(p_counts: list[int], q_counts: list[int], eps: float = 1e-6) -> float:
    """Population stability index between two aligned count vectors.
    Rule of thumb: <0.1 stable, 0.1-0.25 moderate shift, >0.25 major."""
    sp, sq = max(sum(p_counts), 1), max(sum(q_counts), 1)
    out = 0.0
    for a, b in zip(p_counts, q_counts):
        pa, pb = max(a / sp, eps), max(b / sq, eps)
        out += (pa - pb) * math.log(pa / pb)
    return out


def ks_stat(p_counts: list[int], q_counts: list[int]) -> float:
    """Kolmogorov-Smirnov statistic (max CDF gap) on the bucketed
    distributions — a bound on the true KS within one bucket width."""
    sp, sq = max(sum(p_counts), 1), max(sum(q_counts), 1)
    ca = cb = 0.0
    worst = 0.0
    for a, b in zip(p_counts, q_counts):
        ca += a / sp
        cb += b / sq
        worst = max(worst, abs(ca - cb))
    return worst


def drift_report(
    src: DataFrame,
    tgt: DataFrame,
    cols: dict[str, tuple[float, float]],
    n_buckets: int = 20,
    psi_threshold: float = 0.1,
) -> DataFrame:
    """One row per column: (column, psi, ks, src_rows, tgt_rows, status).
    Cost: one scan + one tiny shuffle per side; the comparison itself is
    driver-side over ≤ (n_buckets+2)×#columns collected rows."""
    hs = histogram(src, cols, n_buckets).collect()
    ht = histogram(tgt, cols, n_buckets).collect()
    out = []
    for c in cols:
        a = _collect_hist(hs, c, n_buckets)
        b = _collect_hist(ht, c, n_buckets)
        p = psi(a, b)
        # a side with ZERO non-null mass (all-NULL column, or a non-numeric
        # column the double cast nulled out) was never actually measured —
        # report NO_DATA instead of a vacuous psi(0,0)=0 "STABLE"
        if sum(a) == 0 or sum(b) == 0:
            status = "NO_DATA"
        else:
            status = "STABLE" if p < psi_threshold else "DRIFT"
        out.append((c, float(p), float(ks_stat(a, b)), sum(a), sum(b), status))
    return src.sparkSession.createDataFrame(
        out, "column string, psi double, ks double, src_rows bigint, "
             "tgt_rows bigint, status string",
    )
