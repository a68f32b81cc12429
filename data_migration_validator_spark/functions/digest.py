"""Row / content digest expressions.

Semantics mirror the reference's hash-based quick validation, which computes
``sha2(concat_ws(':', COALESCE(CAST(col AS STRING),'') ...), 256)`` per row
keyed by concatenated primary keys (reference: ``integrations/databricks/
databricks-extract.py:195-219``, ``migration-data-validation.py:887-898``).

Two implementations:

- :func:`row_digest` — pure JVM expression (``F.sha2(F.concat_ws(...))``),
  whole-stage-codegen friendly.  This is the hot path for 10^10-row digests:
  no Python crossing at all.
- :func:`row_digest_pandas` / :func:`content_sha256` — Arrow-vectorized
  ``pandas_udf`` equivalents (input_hint requires the content sha256 invariant
  be computed "in vectorized pandas/Arrow UDFs; no per-row Python").  Data
  moves driver→executor in Arrow batches; hashing runs over a pandas Series
  per batch, never row-at-a-time through pickled Python rows.

Both produce identical lowercase-hex sha256 strings, which the test suite
asserts (``tests/test_digest.py``).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def null_safe_string(col: str | Column) -> Column:
    """``COALESCE(CAST(col AS STRING), '')`` — the reference's normalization
    before hashing/compare (databricks-extract.py:126-154)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("string"), F.lit(""))


def row_digest(
    cols: list[str | Column], sep: str = ":", injective: bool = False
) -> Column:
    """sha256 hex digest of the null-safe-string concatenation of ``cols``.

    JVM-side (``sha2``/``concat_ws``): stays inside whole-stage codegen.

    The default encoding mirrors the REFERENCE's (coalesce-to-'' + ':'
    join, see module docstring) and therefore inherits its ambiguities:
    NULL hashes like '' and ('a:b','c') like ('a','b:c').  Pass
    ``injective=True`` for a collision-free-by-construction encoding —
    each value is tagged (N for null, V for value) and length-prefixed, so
    digest equality implies per-column stringified-value + nullness
    equality.  Use the injective form where digest-equal must imply the
    row-level ``eqNullSafe`` comparison would also match (the validation
    pipeline's bucket short-circuit); keep the default where reference
    digest parity is the contract.
    """
    if not injective:
        return F.sha2(
            F.concat_ws(sep, *[null_safe_string(c) for c in cols]), 256
        )
    parts = []
    for col in cols:
        c = F.col(col) if isinstance(col, str) else col
        cs = c.cast("string")
        parts.append(
            F.when(cs.isNull(), F.lit("\x00N")).otherwise(
                F.concat(
                    F.lit("\x00V"), F.length(cs).cast("string"), F.lit(":"), cs
                )
            )
        )
    return F.sha2(F.concat(*parts), 256)


@F.pandas_udf(StringType())
def _sha256_series(s: pd.Series) -> pd.Series:
    # Arrow batch in; hashlib over the utf-8 bytes of each value.  NULL → ''
    # to match null_safe_string semantics.
    return s.fillna("").map(lambda v: hashlib.sha256(v.encode("utf-8")).hexdigest())


def content_sha256(col: str | Column) -> Column:
    """sha256 of a single string column via Arrow-vectorized pandas UDF.

    The per-row invariant of BASELINE.json input_hint: ``content`` sha256
    equality vs the reference final state.
    """
    c = F.col(col) if isinstance(col, str) else col
    return _sha256_series(c.cast("string"))


def row_digest_pandas(cols: list[str | Column], sep: str = ":") -> Column:
    """pandas-UDF variant of :func:`row_digest` (same output bytes).

    Concatenation happens JVM-side (cheap); only the hash crosses to Python
    in Arrow batches.
    """
    concat = F.concat_ws(sep, *[null_safe_string(c) for c in cols])
    return _sha256_series(concat)
