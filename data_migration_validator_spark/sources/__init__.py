from .files import (
    csv_config_source,
    orc_path_scan,
    parquet_scan,
    recover_hive_partitions,
)
from .jdbc import jdbc_reader_options, jdbc_subquery, range_partition_options

__all__ = [
    "parquet_scan",
    "orc_path_scan",
    "recover_hive_partitions",
    "csv_config_source",
    "jdbc_subquery",
    "jdbc_reader_options",
    "range_partition_options",
]
