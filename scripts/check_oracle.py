"""Driver-mimic: run every queries() entry via Spark and its oracle_sql()
via DuckDB on the same sf dir; compare row-count, column names, and values
(columns sorted by name, rows sorted).  Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as E
from data_migration_validator_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [str(c) for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype(np.float64)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        else:
            df[c] = s.astype(object).where(s.notna(), None)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def compare(name: str, spark_pd: pd.DataFrame, duck_pd: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pd) != len(duck_pd):
        problems.append(f"rowcount {len(spark_pd)} vs {len(duck_pd)}")
    a, b = canon(spark_pd), canon(duck_pd)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns {list(a.columns)} vs {list(b.columns)}")
        return problems
    if len(a) == len(b):
        for c in a.columns:
            x, y = a[c], b[c]
            if pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
                xa = x.astype(np.float64).to_numpy()
                ya = y.astype(np.float64).to_numpy()
                neq = ~((xa == ya) | (np.isnan(xa) & np.isnan(ya)))
            else:
                neq = ~((x == y) | (x.isna() & y.isna()))
            n_bad = int(np.sum(neq))
            if n_bad:
                i = int(np.argmax(np.asarray(neq)))
                problems.append(
                    f"col {c}: {n_bad} diffs, first at row {i}: "
                    f"{a[c].iloc[i]!r} vs {b[c].iloc[i]!r}"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # fixture-backed oracles (simhash) derive their parquet from the same
    # sf dir the views read; the driver's own gate runs at the default
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, osql = E.queries(), E.oracle_sql()
    n_ok = n_fail = n_skip = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in osql:
            print(f"skip  {name}: rows-only ({len(sdf)} rows)")
            n_skip += 1
            continue
        try:
            ddf = con.execute(osql[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:4]))
            n_fail += 1
        else:
            print(f"ok    {name} ({len(sdf)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
