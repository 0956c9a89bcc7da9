from .jobs import (  # noqa: F401
    read_events_stream,
    tumbling_counts,
    session_counts,
    dedup_stream,
    foreach_batch_upsert,
)
