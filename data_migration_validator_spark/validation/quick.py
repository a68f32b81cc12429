"""Hash-based quick validation: the reference's semi-join reduction strategy.

Reference flow (migration-data-validation.py:1884-1905, 887-947): compare
two (key, row_hash) digest sets first, collect ≤1000 anomalous keys per
class, and rewrite the source SQL into a ``WHERE concat_ws(keys) IN (...)``
filter to re-fetch only those rows.  The 1000-key cap silently truncates
results (SURVEY.md §4) and the IN-list is string-spliced SQL.

Here the same algorithm is one declarative plan, uncapped: the anomalous key
set stays a DataFrame and the detail fetch is a broadcast LEFT SEMI join —
at 10^10 rows the detail scan still reads only the columns it needs and the
semi-join prunes at the scan when the key set is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .reconcile import hash_reconcile


def anomalous_keys(
    src: DataFrame,
    tgt: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Keys whose digests disagree (MISMATCH / SRC_EXTRA / TGT_EXTRA).

    ``limit`` reproduces the reference's cap when explicitly requested
    (migration-data-validation.py:900-902); default is uncapped.  A capped
    key set is MATERIALIZED (localCheckpoint) before being returned: a bare
    ``.limit(n)`` re-executes nondeterministically per downstream action, so
    the three frames quick_validate returns could otherwise be computed
    over three DIFFERENT key subsets (the reference collected its capped
    set once and reused it — same idea, kept distributed).
    """
    rec = hash_reconcile(src, tgt, key_cols, compare_cols)
    bad = rec.filter(F.col("status") != "MATCH").select(*key_cols, "status")
    if limit is None:
        return bad
    return bad.limit(limit).localCheckpoint(eager=True)


def fetch_anomalous_rows(
    side: DataFrame,
    keys: DataFrame,
    key_cols: list[str],
    broadcast: bool = False,
) -> DataFrame:
    """Detail re-fetch: semi-join instead of the reference's ≤2000-key
    IN-list rewrite (migration-data-validation.py:929-947).

    ``broadcast=True`` is for callers that KNOW the key set is small
    (e.g. they just applied a limit).  Default leaves the join strategy
    to AQE — when src/tgt diverge heavily the anomalous key set
    approaches full table size, and an unconditional forced broadcast
    there OOMs the driver; AQE still picks broadcast at runtime whenever
    the built side turns out small.
    """
    key_set = keys.select(*key_cols).distinct()
    if broadcast:
        key_set = F.broadcast(key_set)
    return side.join(key_set, on=list(key_cols), how="left_semi")


def quick_validate(
    src: DataFrame,
    tgt: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    limit: int | None = None,
) -> dict[str, DataFrame]:
    """Full quick-validation strategy: digest compare → anomaly keys →
    detail rows from both sides only for anomalous keys.

    Returns {"keys": (key, status) rows, "src_rows": ..., "tgt_rows": ...}.
    With an explicit ``limit`` the key set is known-small, so the detail
    semi-joins broadcast it; uncapped runs let AQE decide.
    """
    keys = anomalous_keys(src, tgt, key_cols, compare_cols, limit=limit)
    bc = limit is not None
    return {
        "keys": keys,
        "src_rows": fetch_anomalous_rows(src, keys, key_cols, broadcast=bc),
        "tgt_rows": fetch_anomalous_rows(tgt, keys, key_cols, broadcast=bc),
    }
