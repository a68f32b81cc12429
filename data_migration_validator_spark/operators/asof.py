"""As-of (time-travel) join — match each left row to the latest right row
at-or-before its timestamp, per key.

Spark has no ASOF JOIN operator (DuckDB/Pandas do); the naive encodings
are both scale-broken: an inequality theta-join explodes to a broadcast
nested loop, and "max(right.ts) per left row then join back" shuffles the
fact table twice.  This implementation is the union-and-carry-forward
form, the one you'd want at 100 TB:

    1. tag right rows side=0 with their payload in ONE struct column,
       left rows side=1 with a NULL payload struct;
    2. union by name — no join node at all;
    3. one window per key ordered by (ts, side, tie):
       ``last(payload, ignorenulls=true)`` over rows
       UNBOUNDED PRECEDING..CURRENT carries the newest right payload
       forward onto every later row;
    4. keep side=1 rows, unpack the struct.

Cost: ONE shuffle of |left| + |right| rows on the key, one in-partition
sort — exactly the cost of the equi-join it replaces.  Hot keys are the
same story as every per-key window here (the sort is per-partition and
spills; for pathological single-key skew, range-bucket the time axis first
and run per-bucket with boundary carry-in).

Tie semantics: a right row AT the left row's timestamp matches
(inclusive, ``strict=False``) because side=0 sorts before side=1 at equal
ts; ``strict=True`` flips the tag order so only strictly-earlier right
rows match.  Among right duplicates at the same (key, ts), the greatest
``right_tie`` column wins — pass one to make results deterministic when
(key, ts) is not unique on the right.

``tolerance`` (seconds for time axes, axis units for numeric ones): matches
older than ``left.ts - tolerance`` are nulled out (pandas ``merge_asof``
semantics); the window still carries them, the filter is a post-projection
evaluated in EXACT integer microseconds (``operators.timeaxis``), so an
exactly-at-tolerance match is kept, never rounded away.

NULL semantics match SQL ASOF / ``merge_asof``: right rows with a NULL
timestamp or NULL key never match anything (they are filtered before the
union — default nulls-first ordering would otherwise sort a NULL-ts right
row before every left row and carry its payload everywhere), and a left row
with a NULL key or NULL timestamp gets a NULL match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .timeaxis import axis_expr


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    strict: bool = False,
    tolerance: float | None = None,
    right_tie: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the matched right payload
    columns (renamed ``<col><suffix>`` on name collisions, plus the matched
    right timestamp as ``<right_ts><suffix>``); all-null when no right row
    precedes the left row.

    ``on``: equality key columns (same names both sides).
    ``right_cols``: right payload to carry (default: everything except the
    keys and timestamp).
    """
    rts = right_ts or left_ts
    keys = list(on)
    rcols = right_cols or [c for c in right.columns if c not in {*keys, rts}]
    # the matched timestamp is ALWAYS emitted as ts_out — carrying rts in
    # the payload too would produce two identically-named struct fields
    rcols = [c for c in rcols if c != rts]
    taken = set(left.columns)
    out_names = {c: (c + suffix if c in taken else c) for c in rcols}
    ts_out = rts + suffix if rts in taken else rts

    # SQL ASOF semantics: a NULL timestamp or NULL key on the right matches
    # nothing (nulls-first window ordering would otherwise carry a NULL-ts
    # payload onto every row, and partitionBy groups NULL keys as equal)
    guard = F.col(rts).isNotNull()
    for k in keys:
        guard = guard & F.col(k).isNotNull()
    right = right.filter(guard)

    pay = F.struct(
        *[F.col(c).alias(out_names[c]) for c in rcols],
        F.col(rts).alias(ts_out),
    )
    # side tag ordering encodes the tie rule: inclusive (right first at
    # equal ts) vs strict (left first, so an equal-ts right row is ignored)
    r_side, l_side = (0, 1) if not strict else (1, 0)
    tie = F.col("__tie") if right_tie else F.lit(0)

    # the two timestamp columns must share one orderable type (timestamp,
    # numeric, date…) — no cast is forced here so integer sequence numbers
    # work as the time axis too
    r_tagged = right.select(
        *keys,
        F.col(rts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        (F.col(right_tie) if right_tie else F.lit(None)).alias("__tie"),
        pay.alias("__pay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{i}")
          for i, c in enumerate(left.columns)],
    )
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.lit(None).alias("__tie"),
        F.lit(None).cast(r_tagged.schema["__pay"].dataType).alias("__pay"),
        *[F.col(c).alias(f"__l_{i}") for i, c in enumerate(left.columns)],
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.col("__side"), tie.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        r_tagged.unionByName(l_tagged)
        .withColumn("__match", F.last("__pay", ignorenulls=True).over(w))
        .filter(F.col("__side") == l_side)
    )
    if tolerance is not None:
        # exact integer-µs arithmetic (timeaxis docstring): a double epoch
        # comparison can flip an exactly-at-tolerance boundary match
        l_axis, l_scale = axis_expr(
            F.col("__ts"), dict(left.dtypes)[left_ts]
        )
        m_axis, r_scale = axis_expr(
            F.col(f"__match.{ts_out}"), dict(right.dtypes)[rts]
        )
        if l_scale != r_scale:
            raise ValueError(
                "left/right timestamp columns must share one axis type "
                "(both time-typed or both numeric) when tolerance is set"
            )
        tol = (
            F.lit(int(round(tolerance * l_scale))) if l_scale != 1
            else F.lit(tolerance)
        )
        in_range = m_axis >= l_axis - tol
        carried = carried.withColumn(
            "__match", F.when(in_range, F.col("__match"))
        )
    return carried.select(
        *[F.col(f"__l_{i}").alias(c) for i, c in enumerate(left.columns)],
        *[F.col(f"__match.{out_names[c]}").alias(out_names[c]) for c in rcols],
        F.col(f"__match.{ts_out}").alias(ts_out),
    )
