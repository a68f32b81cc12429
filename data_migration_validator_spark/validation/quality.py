"""Declarative data-quality rule suite (Deequ-style) over one table.

The reference validates a *pair* of tables against each other; production
migration sign-off also needs single-table contract checks — NOT NULL,
uniqueness, domains, ranges, referential integrity — the constraint surface
a warehouse DDL would carry but a lake table does not enforce.  This module
evaluates a rule list in the minimum number of jobs:

- every ROW-LOCAL rule (not_null / in_range / in_set / matches / satisfies)
  and every uniqueness rule compiles to one aggregate expression, and the
  whole set runs as ONE whole-stage-codegen aggregation pass over the table
  — map-side partial aggregation, a single one-row exchange, no per-rule
  scans (plan-asserted in tests: one scan node regardless of rule count);
- each referential-integrity rule needs its own join, expressed as a
  LEFT ANTI join against the DISTINCT referenced keys — broadcastable when
  the dimension is small, AQE-planned otherwise — plus a count.

Semantics (stated, because null handling is where DQ tools disagree):

- row-local rules count a VIOLATION whenever the rule's predicate does not
  evaluate to TRUE — so a NULL target fails ``in_range``/``in_set``/
  ``matches``/``satisfies`` (compose with ``not_null`` when nulls are
  legal: ``satisfies("col IS NULL OR <pred>")``);
- ``unique`` counts SURPLUS duplicate rows: ``count(*) -
  count(distinct struct(cols))``.  The struct is never null, so all-null
  key combos participate (two (NULL, NULL) rows are one group, one
  surplus) — matching what a dedup would delete;
- ``foreign_key`` follows SQL FK semantics: rows with any NULL key column
  are exempt; an orphan is a fully-non-null key with no match in the
  referenced frame.

The report is assembled driver-side from the one collected aggregate row
(plus one count per FK rule) — scalar bookkeeping at the summary altitude,
same move as ``validation.summary``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class Rule:
    """One check.  ``kind`` ∈ {not_null, unique, in_range, in_set, matches,
    satisfies, foreign_key}; ``target`` names the checked column(s) for the
    report; exactly one of ``ok`` (row-local TRUE-means-pass Column),
    ``unique_cols``, or ``fk`` is set."""

    name: str
    kind: str
    target: str
    ok: Column | None = None
    unique_cols: tuple[str, ...] = ()
    fk: tuple | None = None  # (ref_df, key_cols, ref_cols)


def not_null(col: str, name: str | None = None) -> Rule:
    return Rule(name or f"not_null({col})", "not_null", col,
                ok=F.col(col).isNotNull())


def in_range(col: str, lo, hi, name: str | None = None) -> Rule:
    return Rule(name or f"in_range({col})", "in_range", col,
                ok=F.col(col).between(F.lit(lo), F.lit(hi)))


def in_set(col: str, values: Sequence, name: str | None = None) -> Rule:
    return Rule(name or f"in_set({col})", "in_set", col,
                ok=F.col(col).isin(*list(values)))


def matches(col: str, pattern: str, name: str | None = None) -> Rule:
    return Rule(name or f"matches({col})", "matches", col,
                ok=F.col(col).rlike(pattern))


def satisfies(predicate: str, name: str) -> Rule:
    """Arbitrary row-local SQL predicate; TRUE passes, FALSE/NULL fails."""
    return Rule(name, "satisfies", predicate, ok=F.expr(predicate))


def unique(*cols: str, name: str | None = None) -> Rule:
    return Rule(name or f"unique({','.join(cols)})", "unique",
                ",".join(cols), unique_cols=tuple(cols))


def foreign_key(
    cols: Sequence[str],
    ref: DataFrame,
    ref_cols: Sequence[str],
    name: str | None = None,
) -> Rule:
    return Rule(
        name or f"foreign_key({','.join(cols)})", "foreign_key",
        ",".join(cols), fk=(ref, tuple(cols), tuple(ref_cols)),
    )


_REPORT_SCHEMA = T.StructType(
    [
        T.StructField("rule", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("target", T.StringType(), False),
        T.StructField("violations", T.LongType(), False),
        T.StructField("total", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
    ]
)


def run_checks(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate ``rules`` against ``df``; one report row per rule, in the
    given order: (rule, kind, target, violations, total, status).

    Jobs: exactly ONE aggregation over ``df`` for all row-local + unique
    rules together, plus one anti-join count per foreign_key rule.
    """
    spark: SparkSession = df.sparkSession
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")

    aggs = [F.count(F.lit(1)).alias("__total")]
    slot = {}
    for i, r in enumerate(rules):
        if r.ok is not None:
            # violations = rows where the pass-predicate is not TRUE
            aggs.append(
                F.sum(
                    F.when(~F.coalesce(r.ok, F.lit(False)), 1).otherwise(0)
                ).cast("bigint").alias(f"__v{i}")
            )
            slot[i] = f"__v{i}"
        elif r.unique_cols:
            aggs.append(
                F.count_distinct(F.struct(*[F.col(c) for c in r.unique_cols]))
                .cast("bigint").alias(f"__d{i}")
            )
            slot[i] = f"__d{i}"
        elif r.fk is None:
            raise ValueError(f"rule {r.name!r} defines no check")

    row = df.agg(*aggs).first()
    total = int(row["__total"])

    out = []
    for i, r in enumerate(rules):
        if r.ok is not None:
            v = int(row[slot[i]] or 0)
        elif r.unique_cols:
            v = total - int(row[slot[i]] or 0)
        else:
            ref, cols, ref_cols = r.fk
            non_null = df.select(
                *[F.col(c).alias(f"__k{j}") for j, c in enumerate(cols)]
            )
            for j in range(len(cols)):
                non_null = non_null.filter(F.col(f"__k{j}").isNotNull())
            rhs = ref.select(
                *[F.col(c).alias(f"__k{j}") for j, c in enumerate(ref_cols)]
            ).distinct()
            v = (
                non_null.join(
                    rhs, on=[f"__k{j}" for j in range(len(cols))],
                    how="left_anti",
                ).count()
            )
        out.append((r.name, r.kind, r.target, v, total,
                    "PASS" if v == 0 else "FAIL"))
    return spark.createDataFrame(out, _REPORT_SCHEMA)
