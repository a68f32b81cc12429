from .apply import EVENT_FIELD_IDS, apply_batch, dedup_last_writer_wins  # noqa: F401
from .events import change_events, write_events_batched  # noqa: F401
from .oracle import expected_final_state  # noqa: F401
from .replay import replay  # noqa: F401
from .quarantine import (  # noqa: F401
    classify_events,
    make_quarantine_table,
    quarantine_rows,
)
from .demux import demux_batch, demux_replay  # noqa: F401
