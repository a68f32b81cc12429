from .files import (
    csv_config_source,
    orc_path_scan,
    parquet_scan,
    recover_hive_partitions,
)
from .jdbc import jdbc_reader_options, jdbc_subquery, range_partition_options
from .connectors import (
    mssql_reader_options,
    mssql_scan,
    snowflake_reader_options,
    snowflake_scan,
)
from .metadata import (
    TERADATA_TYPE_CODES,
    decode_teradata_types,
    mssql_schema_query,
    netezza_schema_query,
    normalize_metadata,
    snowflake_schema_query,
    teradata_schema_query,
)

__all__ = [
    "parquet_scan",
    "orc_path_scan",
    "recover_hive_partitions",
    "csv_config_source",
    "jdbc_subquery",
    "jdbc_reader_options",
    "range_partition_options",
    "snowflake_reader_options",
    "snowflake_scan",
    "mssql_reader_options",
    "mssql_scan",
    "TERADATA_TYPE_CODES",
    "decode_teradata_types",
    "teradata_schema_query",
    "mssql_schema_query",
    "netezza_schema_query",
    "snowflake_schema_query",
    "normalize_metadata",
]
