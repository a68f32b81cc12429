from .stream import run_stream_once, start_stream  # noqa: F401
