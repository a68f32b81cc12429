from .stream import run_stream_once, start_stream  # noqa: F401
from .windowed import (  # noqa: F401
    stateful_ordering_gate,
    windowed_event_metrics,
    with_event_time,
)
