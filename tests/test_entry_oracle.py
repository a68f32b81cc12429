"""Replicates the driver's correctness gate in miniature: every
``oracle_sql()`` entry must agree with its ``queries()`` plan on row count,
column names, and values (columns sorted by name, rows sorted).

Runs at sf0.001 so the whole suite stays fast; scripts/check_oracle.py is
the full sf0.01 sweep.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from scripts.check_oracle import TABLES, compare

SF_DIR = "/root/testdata/sf0.001"
# fixture-backed oracles (simhash) must derive their parquet from the SAME
# sf dir as the DuckDB views below (driver default is sf0.01)
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


ORACLE_NAMES = sorted(E.oracle_sql())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, name):
    sdf = E.queries()[name](spark, SF_DIR).toPandas()
    ddf = duck.execute(E.oracle_sql()[name]).df()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns


def test_every_query_has_oracle_or_docstring_reason():
    qs, osql = E.queries(), E.oracle_sql()
    for name in qs:
        if name not in osql:
            # rows-only checks must say so in their docstring
            assert "rows-only" in (qs[name].__doc__ or ""), name
