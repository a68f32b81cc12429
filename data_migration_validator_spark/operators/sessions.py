"""Gap-based sessionization over an event stream.

Assigns a per-key session index: a new session starts when the gap from the
key's previous event exceeds ``gap_s``.  The classic two-window form —
``lag`` marks session starts, a running ``sum`` of the start flags numbers
them — compiled to ONE shuffle on the key and one in-partition sort (both
windows share the same partitioning + ordering, so Catalyst plans a single
Window node over a single Exchange/Sort; asserted in the tests).

Timestamp axes use EXACT integer microsecond arithmetic (``unix_micros``),
not double seconds: a double epoch at 2024 magnitudes carries ~0.24 µs of
representation error, enough to misclassify a gap that sits exactly on the
boundary — and enough to disagree with any exact-arithmetic SQL engine
checking the result.  Numeric axes are compared in their own units.

Scale story: identical to every per-key window in this repo — partial sort
spills, hot keys are bounded by per-user event counts (bounded in any real
clickstream).  The streaming form of the same semantics is Spark's native
``F.session_window`` with a watermark (``streaming.windowed``) — batch and
stream share the gap definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .timeaxis import axis_of as _axis


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_s: float,
    tie_col: str | None = None,
) -> DataFrame:
    """Input rows + ``session_id`` (per-key session index, starting at 1).

    A row opens a new session iff it is the key's first event or
    ``ts - lag(ts) > gap_s`` (strictly greater: an event exactly at the gap
    boundary continues the session, matching ``F.session_window``'s
    half-open [start, last+gap) semantics).  Ties within a key are ordered
    by ``tie_col`` so results are deterministic when timestamps repeat.
    """
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    axis, scale = _axis(df, ts_col)
    gap = int(round(gap_s * scale)) if scale != 1 else gap_s
    prev = F.lag(axis).over(w)
    new_session = (prev.isNull() | (axis - prev > F.lit(gap))).cast("int")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        "session_id", F.sum(new_session).over(running).cast("bigint")
    )


def session_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_s: float,
    tie_col: str | None = None,
) -> DataFrame:
    """One row per (key…, session_id): n_events, start/end timestamps, and
    exact duration along the axis (``duration_us`` for time axes, axis
    units otherwise).  The rollup reuses the sessionize shuffle — grouping
    keys are a superset of the window's partition keys, so only the hash
    aggregate itself is added, no second exchange."""
    sess = sessionize(df, key_cols, ts_col, gap_s, tie_col=tie_col)
    axis, scale = _axis(df, ts_col)
    dur = (F.max(axis) - F.min(axis)).alias(
        "duration_us" if scale != 1 else "duration"
    )
    return sess.groupBy(*key_cols, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        dur,
    )
