"""Shared time-axis normalization for the ordered operators (sessionize,
range join, as-of join).

One rule, one place: time-typed columns (timestamp, timestamp_ntz, date)
compare and bucket on EXACT integer microseconds (``unix_micros``), never
double epoch-seconds — a double epoch at 2024 magnitudes carries ~0.24 µs
of representation error, enough to flip an exact-boundary gap/tolerance
comparison and disagree with any exact-arithmetic engine checking the
result.  Numeric axes stay in their own units (scale 1).

Every operator that buckets, gaps, or tolerances along a time axis must go
through :func:`axis_of` / :func:`axis_expr` so a future change (a new time
type, a different ntz cast) lands everywhere at once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TIME_TYPES = ("timestamp", "timestamp_ntz", "date")


def axis_expr(col: Column, dtype: str) -> tuple[Column, int]:
    """(axis column, scale) for an arbitrary column expression whose Spark
    ``dtype`` string is known: exact integer µs (scale 1_000_000) for time
    types, the raw column (scale 1) otherwise."""
    if dtype in TIME_TYPES:
        return F.unix_micros(col.cast("timestamp")), 1_000_000
    return col, 1


def axis_of(df: DataFrame, col: str) -> tuple[Column, int]:
    """:func:`axis_expr` for a named column of ``df``."""
    return axis_expr(F.col(col), dict(df.dtypes)[col])
