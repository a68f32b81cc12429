"""Native connector scans (S6 Snowflake, S7 MSSQL): option planning +
reader assembly.

No warehouse is reachable in this sandbox, so — as with the JDBC module —
the *planning* halves (option dicts, query pushdown strings) are pure and
unit-tested, and the reader assembly is exercised only when a live
connection is configured.

Reference parity:
- Snowflake: ``integrations/snowflake/snowflake-extract.py:14-46`` —
  ``format("snowflake")`` with sfOptions incl. ``autopushdown: on`` and a
  ``query`` pushdown option.
- MSSQL: ``integrations/mssql/mssql-extract.py:12-46`` —
  ``format("sqlserver")`` with host/port/database/query reader options and
  fetchsize 20000.

Secrets are caller-supplied values here (the reference resolves them from
a workspace secret scope); this engine never stores credentials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def snowflake_reader_options(
    url: str,
    user: str,
    private_key: str,
    database: str,
    schema: str,
    warehouse: str,
    role: str | None = None,
    autopushdown: bool = True,
    **overrides,
) -> dict:
    """sfOptions for the Snowflake connector (snowflake-extract.py:30-39).

    ``autopushdown`` keeps filter/projection/aggregate pushdown ON — at
    warehouse scale the remote engine prunes before bytes move, which is
    the whole point of the native connector over plain JDBC.
    """
    opts = {
        "sfUrl": url,
        "sfUser": user,
        "pem_private_key": private_key,
        "sfDatabase": database,
        "sfSchema": schema,
        "sfWarehouse": warehouse,
        "autopushdown": "on" if autopushdown else "off",
    }
    if role is not None:
        opts["sfRole"] = role
    opts.update(overrides)
    return opts


def snowflake_scan(
    spark: SparkSession, query: str, options: dict
) -> DataFrame:
    """``format("snowflake")`` scan with remote query pushdown
    (snowflake-extract.py:41-46)."""
    return (
        spark.read.format("snowflake")
        .options(**options)
        .option("query", query)
        .load()
    )


def mssql_reader_options(
    hostname: str,
    database: str,
    user: str,
    password: str,
    query: str,
    port: int = 1433,
    fetchsize: int = 20_000,
    **overrides,
) -> dict:
    """Reader options for the native sqlserver connector
    (mssql-extract.py:27-39; fetchsize tuning BASELINE.md)."""
    opts = {
        "host": hostname,
        "port": str(port),
        "user": user,
        "password": password,
        "database": database,
        "query": query,
        "fetchsize": str(fetchsize),
    }
    opts.update(overrides)
    return opts


def mssql_scan(spark: SparkSession, options: dict) -> DataFrame:
    """``format("sqlserver")`` scan (mssql-extract.py:41-46)."""
    return spark.read.format("sqlserver").options(**options).load()
