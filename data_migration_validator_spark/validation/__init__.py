from .checks import primary_key_validation, timeline, windowed_validation  # noqa: F401
from .reconcile import (  # noqa: F401
    column_mismatch_metrics,
    extras,
    full_outer_report,
    hash_reconcile,
    reconcile_counts,
    row_level_mismatches,
    with_row_digest,
)
from .schema_check import (  # noqa: F401
    default_compatibility_matrix,
    name_type_check,
    ordinal_check,
    schema_store,
    type_compatibility,
)
from .summary import validation_summary  # noqa: F401
from .pipeline import run_validation  # noqa: F401
from .quick import anomalous_keys, fetch_anomalous_rows, quick_validate  # noqa: F401
from .mapping import (  # noqa: F401
    TableMapping,
    load_mappings_csv,
    resolve_connections,
    run_mappings,
)
from .store import (  # noqa: F401
    make_column_metrics_table,
    make_log_table,
    make_summary_table,
    persist_column_metrics,
    persist_log,
    persist_summary,
)
from .report import (  # noqa: F401
    anomaly_browser,
    failed_stages,
    latest_run_per_family,
    summary_conjunction,
    top_mismatched_columns,
)
