from .pipeline import (
    EVENTS_SCHEMA,
    read_event_stream,
    run_available_now,
    stream_exact_dedup,
    stream_incremental_append,
    stream_incremental_upsert,
    stream_sessionize,
    stream_tumbling_agg,
    use_rocksdb_state_store,
)

__all__ = [
    "EVENTS_SCHEMA",
    "read_event_stream",
    "run_available_now",
    "stream_exact_dedup",
    "stream_incremental_append",
    "stream_incremental_upsert",
    "stream_sessionize",
    "stream_tumbling_agg",
    "use_rocksdb_state_store",
]
