from .jobs import (  # noqa: F401
    read_events_stream,
    tumbling_counts,
    session_counts,
    dedup_stream,
    dedup_stream_ttl,
    stateful_user_counts,
    cusum_stream,
    tws_user_stats,
    foreach_batch_upsert,
    stream_to_txn_table,
    enrich_stream,
    join_event_streams,
)
