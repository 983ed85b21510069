from .pipeline import (
    EVENTS_SCHEMA,
    read_event_stream,
    run_available_now,
    stream_tumbling_agg,
)

__all__ = [
    "EVENTS_SCHEMA",
    "read_event_stream",
    "run_available_now",
    "stream_tumbling_agg",
]
