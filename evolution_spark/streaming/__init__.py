from evolution_spark.streaming.events import (
    dedup_events,
    read_event_stream,
    running_user_totals,
    session_agg,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "read_event_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_agg",
    "dedup_events",
    "running_user_totals",
]
