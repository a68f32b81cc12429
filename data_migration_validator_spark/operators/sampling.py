"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-dependent per partition layout — re-running the
same job over a repartitioned copy of the corpus yields a DIFFERENT
sample, which poisons train/eval reproducibility.  These operators sample
by a content-derived hash threshold instead: a row is in the sample iff
``md5(key)``'s first 8 hex chars fall below ``fraction * 16^8``.  That is

- deterministic across runs, partitionings and engines (md5 of the same
  UTF-8 string is the same everywhere — the DuckDB oracle runs the
  literal same predicate),
- a pure narrow filter (no shuffle, no sort, codegen'd, pushes the
  cheap md5+substring down next to the scan),
- stable under corpus growth: a row's membership never flips when other
  rows arrive (hash-threshold sampling is how production corpus
  train/holdout splits stay consistent across snapshots).

Stratified variant: per-stratum thresholds from a ``{stratum: fraction}``
map (a CASE chain — strata counts are small), so a lang-skewed corpus can
up/down-sample per language in one pass with zero shuffles.

Reference parity note: no reference row — engine-native training-data
surface (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 16**8


def _threshold_hex(fraction: float) -> str:
    """fraction ∈ [0,1] → 8-char upper bound (row in-sample iff md5-prefix
    < threshold, string compare — lowercase hex orders lexicographically =
    numerically).  fraction == 1.0 returns a sentinel above every hex
    string ('g' > 'f'), so a full sample keeps ALL rows — clamping to
    'ffffffff' with strict '<' would drop rows whose prefix is exactly
    that (≈ a handful at 10^10-row scale)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    if fraction >= 1.0:
        return "g0000000"
    return format(min(int(fraction * _HEX_SPACE), _HEX_SPACE - 1), "08x")


def _key_expr(key_cols: list[str]) -> F.Column:
    """'|'-joined stringified key (concat_ws skips NULLs — same as the
    oracle SQL's concat_ws); the single source of truth for the key hash
    shared by every sampler here and their DuckDB oracles."""
    return F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])


def _hash_prefix(key_cols: list[str]) -> F.Column:
    """First 8 hex chars of md5 over the joined key."""
    return F.substring(F.md5(_key_expr(key_cols)), 1, 8)


def deterministic_sample(
    df: DataFrame, key_cols: list[str], fraction: float
) -> DataFrame:
    """Hash-threshold Bernoulli sample: keeps ~``fraction`` of rows,
    membership a pure function of the key — rerun-stable, engine-portable,
    narrow (no shuffle)."""
    return df.where(_hash_prefix(key_cols) < _threshold_hex(fraction))


def stratified_sample(
    df: DataFrame,
    key_cols: list[str],
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum hash-threshold sample in ONE narrow pass: stratum →
    its own threshold via a CASE chain (strata counts are small; the
    chain stays codegen'd).  A stratum absent from ``fractions`` keeps
    ``default_fraction`` of its rows."""
    thr = F.lit(_threshold_hex(default_fraction))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(_threshold_hex(frac))
        ).otherwise(thr)
    return df.where(_hash_prefix(key_cols) < thr)


def sample_exact_k(df: DataFrame, key_cols: list[str], k: int) -> DataFrame:
    """Exactly-k deterministic sample: the k smallest md5-of-key rows.
    Plans as TakeOrderedAndProject (per-partition top-k, tiny merge on the
    driver) — no global sort, no shuffle of the full data.  Equivalent to
    a seeded reservoir sample but rerun-stable and oracle-checkable
    (ORDER BY md5 LIMIT k)."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    h = "__sample_h"
    while h in df.columns:  # never clobber (then drop) a user column
        h += "_"
    return (
        df.withColumn(h, F.md5(_key_expr(key_cols)))
        .orderBy(h)
        .limit(k)
        .drop(h)
    )
