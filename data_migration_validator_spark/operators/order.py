"""Global ordinal enumeration at scale — the two-phase row_number.

The reference assigns global ordinals with ``row_number() over (order by
a)`` (migration-data-validation DBX:86-117 — fine there because it only
enumerates SCHEMA rows, tens of entries).  At data scale that plan is a
catastrophe: an empty ``OVER (ORDER BY …)`` window forces every row
through ONE partition on one executor.

``global_row_number`` is the scale-correct form:

1. **Deterministic range boundaries.** A hash-deterministic sample of the
   order keys (xxhash64 threshold — NOT ``repartitionByRange``, whose
   reservoir sampling is seeded nondeterministically and re-draws
   different boundaries on every job, which would desynchronize the
   offset pass from the numbering pass) is collected, sorted, and cut
   into ``num_slices`` quantile boundaries.  O(num_slices × sample) bytes
   to the driver, never O(rows).
2. **Slice id as a pure row function.** Each row's slice = the number of
   boundaries ≤ its key (an array-filter expression over broadcast
   boundary literals, codegen'd, narrow).  Pure function of the row ⇒
   every job that evaluates it agrees, run to run.
3. **Offsets.** A metadata-sized job counts rows per slice and the driver
   prefix-sums the counts into slice offsets.
4. **Per-slice numbering.** ``row_number()`` windowed per slice plus the
   broadcast slice offset — the window's hash exchange on the slice id is
   the ONLY shuffle of the data; work is spread across all executors
   with no single-partition stage anywhere.

The result is deterministic whenever the order key is total (e.g. a
unique key): boundaries may place a key in a different slice at a
different ``num_slices``, but offsets adapt so each row's global ordinal
is invariant.  NULL keys sort first (slice 0), matching the window's
default null ordering.  A single dominant key skews its slice — the same
property range partitioning has; pick a more selective key if that
bites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HASH_MOD = 1_000_000


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "row_num",
    num_slices: int | None = None,
    sample_per_slice: int = 200,
) -> DataFrame:
    """Add ``out_col`` = the 1-based global ordinal of each row under
    ``ORDER BY order_cols`` — without ever funneling the data through a
    single partition (see module docstring for the plan shape).

    ``order_cols`` should form a total order (ties get arbitrary but
    consistent-within-run ordinals).  ``num_slices`` defaults to the
    session's shuffle parallelism.
    """
    sliced, sid = _sliced(df, order_cols, num_slices, sample_per_slice)
    if sliced is None:
        return df.withColumn(out_col, F.lit(None).cast("bigint"))

    # 3. O(#slices) rows to the driver — never O(data)
    counts = sorted(
        (r[sid], r["n"])
        for r in sliced.groupBy(sid).agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = [], 0
    for p, cnt in counts:
        offsets.append((p, acc))
        acc += cnt

    # 4. per-slice numbering + offset looked up from a literal map (tiny —
    # one entry per slice; cheaper than any join and sidesteps a Spark
    # 4.1.2 binding bug in broadcast-join-under-window plans): ONE data
    # shuffle total (the window's hash exchange on the slice id)
    off_map = F.create_map(
        *[F.lit(x) for p, o in offsets for x in (p, o)]
    )
    w = Window.partitionBy(sid).orderBy(*[F.col(c) for c in order_cols])
    return (
        sliced.withColumn(
            out_col,
            F.row_number().over(w).cast("bigint")
            + off_map[F.col(sid)].cast("bigint"),
        )
        .drop(sid)
    )


def _sliced(
    df: DataFrame,
    order_cols: list[str],
    num_slices: int | None,
    sample_per_slice: int,
) -> tuple[DataFrame | None, str]:
    """Steps 1-2 of the boundary-slice plan, shared by every global-order
    operator: deterministic boundary sample + pure slice-id column.
    Returns ``(df + slice column, slice column name)``; ``(None, sid)``
    for an empty input."""
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    sid = "__grn_sid"
    while sid in df.columns:
        sid += "_"
    spark = df.sparkSession
    if num_slices is None:
        num_slices = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    n = df.count()
    if n == 0:
        return None, sid

    # 1. deterministic sample of order keys -> sorted boundary cut points
    target = max(num_slices * sample_per_slice, 1)
    frac = min(1.0, target / n)
    sample = df.select(*order_cols)
    if frac < 1.0:
        h = F.pmod(
            F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(_HASH_MOD)
        )
        # max(1, ...): int() truncation would zero the threshold once
        # n > target * _HASH_MOD (~6e9 rows at the defaults), silently
        # collapsing every row into ONE window partition — the exact
        # single-partition catastrophe this operator exists to avoid
        sample = sample.where(h < max(1, int(frac * _HASH_MOD)))
    keys = sorted(
        {
            tuple(r[c] for c in order_cols)
            for r in sample.collect()
            if all(r[c] is not None for c in order_cols)
        }
    )
    bounds: list[tuple] = []
    for i in range(1, num_slices):
        if not keys:
            break
        b = keys[i * len(keys) // num_slices]
        if not bounds or bounds[-1] != b:
            bounds.append(b)

    # 2. slice id = #boundaries <= key (pure, narrow, codegen'd); NULL keys
    # compare to null -> filtered out -> slice 0, matching nulls-first.
    if len(order_cols) == 1:
        key = F.col(order_cols[0])
        blits = [F.lit(b[0]) for b in bounds]
    else:
        key = F.struct(*[F.col(c).alias(c) for c in order_cols])
        blits = [
            F.struct(*[F.lit(v).alias(c) for c, v in zip(order_cols, b)])
            for b in bounds
        ]
    if bounds:
        sid_expr = F.size(F.filter(F.array(*blits), lambda b: b <= key))
    else:
        sid_expr = F.lit(0)
    return df.withColumn(sid, sid_expr.cast("int")), sid


def pack_shards(
    df: DataFrame,
    weight_col: str,
    order_cols: list[str],
    budget: int,
    out_col: str = "shard_id",
    num_slices: int | None = None,
    sample_per_slice: int = 200,
) -> DataFrame:
    """Sequential shard packing for training-data layout: assign each row
    the 0-based shard its EXCLUSIVE running-weight prefix falls in under
    ``ORDER BY order_cols`` —

        ``shard_id = floor((cumsum(weight) - weight) / budget)``

    i.e. documents stream into a shard until its ``budget`` (e.g. a token
    target) is reached, then the next shard opens; a document straddling
    the boundary goes to the shard it STARTED in (standard sequence-
    packing spillover, so every shard holds ≥ budget - max_doc_weight).

    Scale shape: the naive form is ``SUM(w) OVER (ORDER BY …)`` — a
    single-partition global window.  This uses the same boundary-slice
    plan as :func:`global_row_number`: deterministic range slices, ONE
    metadata-sized job for per-slice weight totals (driver prefix-sums
    them into slice offsets), then a per-slice running sum + offset — one
    data shuffle total, no single-partition stage.

    ``weight_col`` must be an INTEGRAL column (tinyint..bigint — fractional
    weights would be floored row-by-row, systematically overshooting the
    budget; pre-round them explicitly) and non-negative (negative weights
    make the running sum non-monotone and shard ids meaningless); NULL
    weighs 0.  ``order_cols`` should form a total order — ties get
    arbitrary but consistent-within-run packing.  Shard assignment is
    exact integer arithmetic end to end: a double division would round
    boundary rows into the wrong shard once the running sum passes 2^53.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    from pyspark.sql import types as _T

    wt_type = df.schema[weight_col].dataType
    if not isinstance(
        wt_type, (_T.ByteType, _T.ShortType, _T.IntegerType, _T.LongType)
    ):
        raise ValueError(
            f"weight_col {weight_col!r} must be integral, got "
            f"{wt_type.simpleString()}; round it explicitly first"
        )
    sliced, sid = _sliced(df, order_cols, num_slices, sample_per_slice)
    if sliced is None:
        return df.withColumn(out_col, F.lit(None).cast("bigint"))
    wt = F.coalesce(F.col(weight_col).cast("bigint"), F.lit(0))

    totals = sorted(
        (r[sid], int(r["w"] or 0))
        for r in sliced.groupBy(sid).agg(F.sum(wt).alias("w")).collect()
    )
    offsets, acc = [], 0
    for p, s in totals:
        offsets.append((p, acc))
        acc += s

    off_map = F.create_map(*[F.lit(x) for p, o in offsets for x in (p, o)])
    w = (
        Window.partitionBy(sid)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_excl = F.sum(wt).over(w) + off_map[F.col(sid)].cast("bigint") - wt
    cx = "__ps_cum"
    while cx in sliced.columns:
        cx += "_"
    return (
        sliced.withColumn(cx, cum_excl)
        # integer `div`: exact for any bigint prefix, where a double
        # FLOOR(x/y) misrounds boundary rows past 2^53
        .withColumn(out_col, F.expr(f"`{cx}` div {int(budget)}").cast("bigint"))
        .drop(sid, cx)
    )
