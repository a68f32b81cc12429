"""PII / secret scrubbing over text columns — training-data hygiene.

A 100 TB corpus scrub must stay JVM-side: every redaction below is a
``regexp_count`` / ``regexp_replace`` chain inside whole-stage codegen —
no Python in the hot path, no shuffle (narrow map over the scan).  The
patterns are deliberately RE2-compatible (no backrefs, no lookaround) so
the same literal pattern strings run unchanged in the DuckDB oracle
(`len(regexp_extract_all(...))` / nested `regexp_replace(..., 'g')`),
giving the scrub a value-level correctness gate, not just a row count.

Scope note: these are the high-yield scrubs for source-code/text corpora
(emails, IPv4 literals, long hex blobs that catch API keys, tokens and
password hashes).  The shape is extensible — callers pass their own
``(kind, pattern)`` list and the plan stays one codegen stage per text
column regardless of pattern count.

Reference parity note: the reference validator has no scrub operator;
this is part of the engine-native training-data surface (SURVEY.md §2.11)
alongside dedup/similarity/text-quality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Ordered: counts are taken on the ORIGINAL text for every kind, then the
# replacements apply in THIS order (an email is redacted before the hex
# scrub could eat a hex-looking local part).  Keep the oracle SQL's
# nesting order identical.
DEFAULT_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("hexsecret", r"\b[0-9a-fA-F]{32,}\b"),
]


def scrub_text(
    df: DataFrame,
    text_col: str = "text",
    patterns: list[tuple[str, str]] | None = None,
    out_col: str = "scrubbed_text",
) -> DataFrame:
    """Redact every pattern match in ``text_col`` and count what was hit.

    Adds one ``n_<kind>`` int column per pattern (match count against the
    ORIGINAL text) plus ``out_col`` with all matches replaced by
    ``<KIND_REDACTED>`` tokens, applied in list order.  Pure built-ins —
    one narrow projection, fully codegen'd, safe at any scale.
    """
    pats = DEFAULT_PATTERNS if patterns is None else patterns
    out = df
    for kind, pat in pats:
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pat))
        )
    scrubbed = F.col(text_col)
    for kind, pat in pats:
        scrubbed = F.regexp_replace(
            scrubbed, pat, f"<{kind.upper()}_REDACTED>"
        )
    return out.withColumn(out_col, scrubbed)


def scrub_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Per-document scrub audit row: id, per-kind hit counts, and the
    sha256 + length of the scrubbed text (the digest is the value-level
    proof the redaction ran byte-identically — same trick as the replay
    verifier's content digests)."""
    pats = DEFAULT_PATTERNS if patterns is None else patterns
    s = scrub_text(df, text_col=text_col, patterns=pats)
    return s.select(
        F.col(id_col),
        *[F.col(f"n_{kind}").alias(f"n_{kind}") for kind, _ in pats],
        F.sha2(F.col("scrubbed_text"), 256).alias("scrub_sha"),
        F.length(F.col("scrubbed_text")).alias("scrub_len"),
    )
