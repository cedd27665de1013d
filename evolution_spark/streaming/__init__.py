from evolution_spark.streaming.sinks import (
    idempotent_parquet_sink,
    partitioned_rollup_sink,
    read_partitioned_rollup,
    read_scd2_dimension,
    scd2_upsert_sink,
)
from evolution_spark.streaming.flf_stream import (
    convert_flf_stream,
    enrich_events_with_dims,
    read_flf_stream,
)
from evolution_spark.streaming.events import (
    click_purchase_join,
    dedup_events,
    read_event_stream,
    running_user_totals,
    session_agg,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "convert_flf_stream",
    "read_flf_stream",
    "enrich_events_with_dims",
    "read_event_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_agg",
    "dedup_events",
    "running_user_totals",
    "click_purchase_join",
    "idempotent_parquet_sink",
    "partitioned_rollup_sink",
    "read_partitioned_rollup",
    "read_scd2_dimension",
    "scd2_upsert_sink",
]
