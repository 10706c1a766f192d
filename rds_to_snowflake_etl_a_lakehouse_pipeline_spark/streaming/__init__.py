"""Event-time windowed analytics: batch-first builders that run
unchanged on Structured-Streaming DataFrames."""

from .events import (  # noqa: F401
    compact_batch_partitions,
    dedup_events,
    interval_join,
    run_available_now,
    running_user_totals,
    session_table_stats,
    sessionized,
    sliding_counts,
    stream_events,
    stream_events_auto,
    stream_incremental_distinct,
    stream_incremental_merge,
    stream_media_dedup,
    stream_quarantine,
    stream_sessionize,
    stream_static_join,
    stream_to_warehouse,
    stream_versioned_merge,
    tumbling_counts,
)
