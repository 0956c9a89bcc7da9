from .jobs import (  # noqa: F401
    read_events_stream,
    tumbling_counts,
    session_counts,
    dedup_stream,
    stateful_user_counts,
    foreach_batch_upsert,
    enrich_stream,
    join_event_streams,
)
