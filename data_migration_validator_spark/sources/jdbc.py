"""JDBC source planning (S3-S8): subquery pushdown + range-partitioned
parallel reads.

No warehouse is reachable in this sandbox, so the *connection* is exercised
only when a URL is supplied; the *planning* logic — the part the reference
implements per dialect — is pure and unit-tested:

- ``jdbc_subquery``: wrap user SQL/filters as ``(select ... ) a`` so the
  remote engine executes them (netezza-extract.py:11-39 and the other
  dialect extractors all do exactly this with f-strings).
- ``jdbc_reader_options``: fetchsize/numPartitions defaults per the
  reference's per-dialect tuning table (BASELINE.md).
- ``range_partition_options``: the Hive range-partitioned read
  (hive-extract.ipynb cell 5/8): boundary min/max over ``hash(pk)`` →
  partitionColumn/lowerBound/upperBound/numPartitions with the
  null-boundary guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DIALECT_DEFAULTS: dict[str, dict] = {
    # fetchsize / numPartitions per the reference extractors
    "netezza": {"fetchsize": 10_000, "numPartitions": 9},
    "oracle": {"fetchsize": 10_000, "numPartitions": 100},
    "teradata": {"fetchsize": 10_000, "numPartitions": 100},
    "mssql": {"fetchsize": 20_000, "numPartitions": 8},
    "hive": {"fetchSize": 1_000_000, "numPartitions": 5},
    "generic": {"fetchsize": 10_000, "numPartitions": 8},
}


def jdbc_subquery(
    table: str,
    columns: list[str] | None = None,
    predicate: str | None = None,
    alias: str = "a",
) -> str:
    """``(SELECT cols FROM table WHERE pred) a`` — remote pushdown subquery."""
    cols = ", ".join(columns) if columns else "*"
    where = f" WHERE {predicate}" if predicate else ""
    return f"(SELECT {cols} FROM {table}{where}) {alias}"


def jdbc_reader_options(dialect: str = "generic", **overrides) -> dict:
    opts = dict(DIALECT_DEFAULTS.get(dialect, DIALECT_DEFAULTS["generic"]))
    opts.update(overrides)
    return opts


def range_partition_options(
    lower: int | None,
    upper: int | None,
    partition_column: str,
    num_partitions: int = 5,
) -> dict:
    """Partitioned-read options from precomputed hash boundaries.

    The reference computes ``min/max(hash(pk))`` remotely (hive-extract.ipynb
    cell 5) then guards NULL boundaries (empty table) by falling back to a
    single partition (cell 8) — same here.
    """
    if lower is None or upper is None or lower == upper:
        return {"numPartitions": 1}
    return {
        "partitionColumn": partition_column,
        "lowerBound": str(lower),
        "upperBound": str(upper),
        "numPartitions": str(num_partitions),
    }


def jdbc_scan(
    spark: SparkSession,
    url: str,
    dbtable: str,
    dialect: str = "generic",
    partition_options: dict | None = None,
    **options,
) -> DataFrame:
    """Assemble the actual reader (S3-S8).  Untested here (no remote DB);
    the planning inputs above are what the tests cover."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", dbtable)
    for k, v in jdbc_reader_options(dialect, **options).items():
        reader = reader.option(k, v)
    for k, v in (partition_options or {}).items():
        reader = reader.option(k, v)
    return reader.load()
