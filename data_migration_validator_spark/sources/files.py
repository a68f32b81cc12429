"""File sources: path scans with Hive-style partition recovery, CSV config.

Reference parity:
- S2 ORC path scan + partition recovery (databricks-extract.py:26-49 —
  ``get_partitions`` regex-extracts ``k=v`` from ``_metadata.file_path`` and
  casts the values; used at 181-187, 249-251).
- S15 CSV config source (conf/setup_ddls.py:124-130, sample_data.py:184-200):
  header/multiLine/escape/inferSchema CSV.

The scan functions are declarative: filters/pruning push down via DSv2
(check ``.explain`` for PushedFilters/ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parquet_scan(
    spark: SparkSession,
    paths: str | list[str],
    columns: list[str] | None = None,
    predicate: str | None = None,
) -> DataFrame:
    """Pruned/pushed-down parquet scan: select-list + predicate reach the
    reader (the declarative replacement for the reference's string-spliced
    ``select * from t where {filter}``, databricks-extract.py:229-258)."""
    df = spark.read.parquet(*([paths] if isinstance(paths, str) else paths))
    if predicate:
        df = df.where(predicate)
    if columns:
        df = df.select(*columns)
    return df


def recover_hive_partitions(
    df: DataFrame, partition_cols: dict[str, str]
) -> DataFrame:
    """Extract ``k=v`` partition values from ``_metadata.file_path`` and cast
    them — the reference's get_partitions (databricks-extract.py:26-49) as
    one projection; no per-file driver loop.

    ``partition_cols`` maps column name → spark type string.

    Matches native recovery on two edges the naive extract misses: the
    column name is regex-escaped (a name like ``a+b`` must match literally)
    and the extracted value is percent-DECODED — Spark's writer escapes
    special chars in partition values (``lang=c++`` lands as
    ``lang=c%2B%2B/``), so the raw path fragment is not the value.
    """
    import re as _re

    out = df
    for name, typ in partition_cols.items():
        raw = F.regexp_extract(
            F.col("_metadata.file_path"),
            f"(^|/){_re.escape(name)}=([^/]+)/",
            2,
        )
        out = out.withColumn(
            name,
            F.when(raw == "", F.lit(None)).otherwise(F.url_decode(raw)).cast(typ),
        )
    return out


def orc_path_scan(
    spark: SparkSession,
    paths: list[str],
    partition_cols: dict[str, str] | None = None,
    base_path: str | None = None,
) -> DataFrame:
    """ORC scan over explicit file paths (S2).  With ``base_path`` Spark
    recovers ``k=v`` partitions natively; otherwise ``partition_cols``
    recovers them from the file path column."""
    reader = spark.read.format("orc")
    if base_path:
        reader = reader.option("basePath", base_path)
    df = reader.load(paths)
    if partition_cols and not base_path:
        df = recover_hive_partitions(df, partition_cols)
    return df


def csv_config_source(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """Config CSV with the reference's reader options (setup_ddls.py:124-130)."""
    reader = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
    )
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)
