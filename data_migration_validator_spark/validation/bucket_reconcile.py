"""Digest-first reconciliation: compare per-bucket aggregate digests, then
run the row-level comparison ONLY on buckets whose digests disagree.

The full-outer ``hash_reconcile`` (reconcile.py) shuffles BOTH tables on the
key — at 100 TB that exchange dominates the whole validation even when the
tables are identical, which at steady state they almost always are.  This
module replaces the wide shuffle with:

1. one narrow scan per side producing a bounded aggregate — per hash bucket
   (``pmod(xxhash64(keys), n_buckets)``) the row count and two independent
   60-bit digest slices SUMMED as exact decimals.  The map side collapses to
   ≤ n_buckets rows per task (hash aggregate partials), so the only exchange
   moves O(tasks × n_buckets) tiny rows;
2. a driver-side compare of the two ≤ n_buckets summaries (bounded collect);
3. the classic full-outer ``hash_reconcile`` re-run on the differing buckets
   only — both sides filtered by the same bucket expression, so the rescan
   shuffles just the slice that can contain anomalies.

Equal multisets per bucket ⇒ equal (count, sum₁, sum₂); the converse is
probabilistic: a differing bucket escapes detection only if its symmetric
difference sums to zero in BOTH independent 60-bit folds AND matches counts.
SUM, not XOR, is the multiset fold: an XOR fold cancels any EVEN-multiplicity
difference deterministically (src holding row X twice vs tgt holding row Y
twice gives X^X = Y^Y = 0 in every fold — always a false clean), whereas the
exact-decimal sums differ unless the slice VALUES collide, ~2⁻¹²⁰ combined
for non-adversarial corruption (sha256 input makes crafting cancellations as
hard as finding structured collisions).  Callers needing certainty re-run
the exact reconcile; the anomalies this returns are exactly the full
reconcile's non-MATCH rows whenever the digest pass is truthful.

Preconditions for "anomalies == full reconcile's non-MATCH rows":

- key columns are non-null on both sides (the engine's quarantine enforces
  this at ingest).  A NULL key hashes deterministically into a bucket — the
  digest pass will happily MATCH two identical null-key rows — but the
  full-outer join never joins NULL keys, so the row-level pass would call
  them SRC_EXTRA + TGT_EXTRA.  With null keys, run the exact reconcile.
- bucket digests use ``row_digest(..., injective=True)`` (null-tagged,
  length-prefixed), so digest-equal implies stringified-value + nullness
  equality per column — NULL-vs-'' and separator shifts cannot produce a
  false clean.  Binary columns are the one caveat (cast-to-string is not
  injective for them); don't short-circuit on binary compare columns.

Reference parity: this is a scale-path alternative to getHashAnomalies
(migration-data-validation.py:887-924), whose 4-join plan the plain
``hash_reconcile`` already collapses to one; here the join disappears
entirely for clean buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.digest import row_digest
from .reconcile import hash_reconcile

#: Independent 60-bit slices of the sha256 hex digest (15 hex chars each,
#: parsed base-16 → non-negative bigint, summed as decimal(38,0): headroom
#: for 10^19 rows per bucket with zero overflow under ANSI mode).
_SLICES = ((1, 15), (16, 15))


def _bucket_expr(key_cols: list[str], n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(*[F.col(k) for k in key_cols]), F.lit(n_buckets)).cast(
        "int"
    )


def bucket_digests(
    df: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    n_buckets: int = 1024,
    bucket_expr: F.Column | None = None,
) -> DataFrame:
    """Per-bucket (bucket, n_rows, sum1, sum2) — one narrow scan, one tiny
    exchange (map-side partials collapse each task to ≤ n_buckets rows).

    ``bucket_expr`` overrides the default key-hash bucketing; it must be a
    deterministic function of the key columns (e.g. a LakeTable's own
    layout expression) so a key lands in the same bucket on both sides."""
    if bucket_expr is None:
        bucket_expr = _bucket_expr(key_cols, n_buckets)
    # injective encoding: digest-equal must imply the row-level comparison
    # (eqNullSafe on stringified values) also matches — the reference's
    # lenient encoding would wave NULL-vs-'' and separator shifts through
    h = row_digest(list(key_cols) + list(compare_cols), injective=True)
    slices = {
        f"__h{i}": F.conv(F.substring(h, start, width), 16, 10)
        .cast("long")
        .cast("decimal(28,0)")
        for i, (start, width) in enumerate(_SLICES)
    }
    return (
        df.select(bucket_expr.cast("int").alias("bucket"), *[
            e.alias(n) for n, e in slices.items()
        ])
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__h0").alias("sum1"),
            F.sum("__h1").alias("sum2"),
        )
    )


def bucket_summary(
    src: DataFrame,
    tgt: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    n_buckets: int = 1024,
    bucket_expr: F.Column | None = None,
) -> DataFrame:
    """Full-outer join of the two bucket-digest frames: one row per bucket
    present on either side with ``bucket_match`` = counts and both sum folds
    null-safe-equal.  ≤ n_buckets rows — safe to collect."""
    if compare_cols is None:
        compare_cols = sorted(set(src.columns) & set(tgt.columns) - set(key_cols))
    sd = bucket_digests(src, key_cols, compare_cols, n_buckets, bucket_expr).select(
        "bucket",
        F.col("n_rows").alias("src_rows"),
        F.col("sum1").alias("src_sum1"),
        F.col("sum2").alias("src_sum2"),
    )
    td = bucket_digests(tgt, key_cols, compare_cols, n_buckets, bucket_expr).select(
        "bucket",
        F.col("n_rows").alias("tgt_rows"),
        F.col("sum1").alias("tgt_sum1"),
        F.col("sum2").alias("tgt_sum2"),
    )
    j = sd.join(td, on="bucket", how="full_outer")
    match = (
        F.col("src_rows").eqNullSafe(F.col("tgt_rows"))
        & F.col("src_sum1").eqNullSafe(F.col("tgt_sum1"))
        & F.col("src_sum2").eqNullSafe(F.col("tgt_sum2"))
    )
    return j.withColumn("bucket_match", match)


def bucket_reconcile(
    src: DataFrame,
    tgt: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    n_buckets: int = 1024,
) -> tuple[list[int], DataFrame]:
    """Short-circuit reconcile.

    Returns ``(differing_buckets, anomalies)``: the bucket ids whose
    aggregate digests disagree, and the row-level ``hash_reconcile`` frame
    (status != MATCH only) computed over JUST those buckets.  When the
    tables agree, ``differing_buckets == []`` and the anomalies frame is
    empty without either table ever being shuffled on the key.

    The anomalies equal the full ``hash_reconcile``'s non-MATCH rows: a
    bucket whose multisets agree contributes only MATCH rows, and every
    key lands in the same bucket on both sides (same hash expression).
    """
    if compare_cols is None:
        compare_cols = sorted(set(src.columns) & set(tgt.columns) - set(key_cols))
    summary = bucket_summary(src, tgt, key_cols, compare_cols, n_buckets)
    bad = sorted(
        int(r["bucket"])
        for r in summary.filter(~F.col("bucket_match")).select("bucket").collect()
    )
    if not bad:
        empty = hash_reconcile(
            src.limit(0), tgt.limit(0), key_cols, compare_cols
        ).filter(F.lit(False))
        return [], empty
    b = _bucket_expr(key_cols, n_buckets)
    anomalies = hash_reconcile(
        src.filter(b.isin(bad)),
        tgt.filter(b.isin(bad)),
        key_cols,
        compare_cols,
    ).filter(F.col("status") != "MATCH")
    return bad, anomalies


def lake_bucket_reconcile(
    table,
    src: DataFrame,
    compare_cols: list[str] | None = None,
) -> tuple[list[int], DataFrame]:
    """Short-circuit reconcile of a :class:`~..lake.table.LakeTable` against
    a source DataFrame, aligned with the TABLE'S OWN bucket layout.

    The digest bucket is the table's storage bucket expression
    (``pmod(xxhash64(bucket_source), num_buckets)``) — a deterministic
    function of the key (``bucket_source`` is a key column), so both sides
    agree.  The payoff over the generic :func:`bucket_reconcile`: the
    dirty-bucket rescan on the table side goes through
    ``table.read(buckets=bad)``, which prunes at FILE level — only the
    differing buckets' files are ever re-read, instead of a full second
    scan with a post-hoc filter.  The src side (external system, arbitrary
    DataFrame) is filtered by the same expression.
    """
    key_cols = list(table.key_cols)
    if compare_cols is None:
        compare_cols = sorted(
            set(src.columns) & {f.name for f in table.schema.fields} - set(key_cols)
        )
    n = table.num_buckets
    bexpr = table.bucket_expr()
    summary = bucket_summary(
        src, table.read(), key_cols, compare_cols, n, bucket_expr=bexpr
    )
    bad = sorted(
        int(r["bucket"])
        for r in summary.filter(~F.col("bucket_match")).select("bucket").collect()
    )
    if not bad:
        empty = hash_reconcile(
            src.limit(0), table.read().limit(0), key_cols, compare_cols
        ).filter(F.lit(False))
        return [], empty
    anomalies = hash_reconcile(
        src.filter(bexpr.isin(bad)),
        table.read(buckets=bad),  # file-pruned: only dirty buckets' files
        key_cols,
        compare_cols,
    ).filter(F.col("status") != "MATCH")
    return bad, anomalies
