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


def mixture_plan(
    counts: dict[str, int],
    targets: dict[str, float],
    max_total: int | None = None,
) -> dict[str, float]:
    """Solve per-domain sampling fractions for a target corpus MIXTURE.

    Training-data pipelines rarely want a uniform sample — they want the
    OUTPUT to follow a prescribed source mix (e.g. 50% code / 30% web /
    20% books) regardless of how skewed the raw corpus is.  Given
    available per-domain row counts and target proportions (normalized
    over the targeted domains), the largest total consistent with
    availability is ``T = min_d(n_d / p_d)`` (the scarcest domain binds);
    each domain then samples at ``rate_d = p_d · T / n_d`` — the binding
    domain at 1.0, abundant domains down-sampled.  ``max_total`` caps T
    (sub-sampling every domain proportionally).  A targeted domain with
    ZERO available rows makes the exact mix infeasible: T = 0 and the
    plan is empty — callers that prefer best-effort drop the domain from
    ``targets`` and re-solve.

    Pure driver-side arithmetic on #domains numbers; the data-touching
    halves are one count aggregation (caller) and one narrow
    hash-threshold filter (:func:`mixture_sample`).
    """
    if not targets:
        return {}
    s = sum(targets.values())
    if s <= 0:
        raise ValueError("targets must have positive total weight")
    norm = {d: p / s for d, p in targets.items() if p > 0}
    t_max = min(counts.get(d, 0) / p for d, p in norm.items())
    if max_total is not None:
        t_max = min(t_max, float(max_total))
    if t_max <= 0:
        return {}
    return {
        d: min(1.0, p * t_max / counts[d])
        for d, p in norm.items()
        if counts.get(d)
    }


def mixture_sample(
    df: DataFrame,
    key_cols: list[str],
    domain_col: str,
    targets: dict[str, float],
    max_total: int | None = None,
) -> DataFrame:
    """Deterministic domain-mixture sample: ONE count aggregation (only the
    targeted domains, narrow) + :func:`mixture_plan` + ONE per-domain
    hash-threshold filter — the output approximates the target mixture,
    maximal size under availability, rerun/partitioning-stable, and no
    shuffle ever touches the payload.  Domains outside ``targets`` are
    dropped (the mixture defines the corpus)."""
    domains = [d for d, p in targets.items() if p > 0]
    if not domains:
        return df.limit(0)
    counts = {
        r[domain_col]: r["__n"]
        for r in (
            df.filter(F.col(domain_col).isin(domains))
            .groupBy(domain_col)
            .agg(F.count(F.lit(1)).alias("__n"))
            .collect()
        )
    }
    plan = mixture_plan(counts, targets, max_total)
    if not plan:
        return df.limit(0)
    return stratified_sample(
        df.filter(F.col(domain_col).isin(list(plan))),
        key_cols,
        domain_col,
        plan,
        default_fraction=0.0,
    )
