"""Trivially-correct batch oracle for replay equivalence (SURVEY.md §5).

Computes the expected final table state from the raw event stream in one
declarative pass: last event per (repo, path) wins; if it is a delete the key
is absent.  This is the W4-shaped "latest record per key" window the
reference uses for batch status (``migration-data-validation.py:1802-1804``),
applied to the whole stream at once.  The engine must reproduce this state
through incremental batch-by-batch MERGE replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def expected_final_state(
    events: DataFrame,
    payload_cols: list[str] = ("commit", "lang", "content"),
    key_cols: list[str] = ("repo", "path"),
) -> DataFrame:
    """Expected (repo, path, *payload) after a full replay of ``events``."""
    dml = events.filter(F.col("op").isin("insert", "update", "delete"))
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("event_seq").desc(), F.col("commit").desc()
    )
    last = (
        dml.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return last.filter(F.col("op") != "delete").select(*key_cols, *payload_cols)
