"""Structured Streaming surface over the events stream (SURVEY.md §2.3):
watermarked tumbling/sliding windows, session windows, stateful dedup, and a
custom stateful operator via ``applyInPandasWithState``.

Each transformation takes a (possibly streaming) events DataFrame with
columns ``event_id ts user_id event_type value`` and returns a DataFrame that
works identically under ``readStream`` (incremental, watermark-driven state
eviction) and batch (the batch twins live in ``evolution_spark.queries.events``
and are oracle-checked — same logic, two execution modes).

Scale notes: every operator's state is keyed (window/user), so state stores
partition across executors; the watermark bounds state size — without it a
100 TB/day stream would accumulate state forever.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source event stream: new parquet files appearing under
    ``source_dir`` are processed incrementally (the standard replay/ingest
    pattern; swap for kafka.readStream in production with the same schema)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts/sums per event type. Late rows
    beyond the watermark are dropped; window state is evicted once the
    watermark passes window end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding-window aggregation (each event lands in
    window/slide overlapping windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "n",
            "sum_value",
        )
    )


def session_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows (inactivity gap) per user via ``session_window`` —
    the incremental twin of the batch gaps-and-islands sessionizer
    (queries/events.py::session_window_gaps)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def dedup_events(
    events: DataFrame, watermark: str = "2 hours", within_watermark: bool = True
) -> DataFrame:
    """Stateful exact dedup on (event_id): dropDuplicatesWithinWatermark
    keeps dedup state only for the watermark horizon (bounded state — the
    100 TB/day requirement); ``within_watermark=False`` uses unbounded
    dropDuplicates (exact-forever semantics, unbounded state)."""
    with_wm = events.withWatermark("ts", watermark)
    if within_watermark:
        return with_wm.dropDuplicatesWithinWatermark(["event_id"])
    return with_wm.dropDuplicates(["event_id"])


_TOTALS_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
_TOTALS_STATE = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _totals_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Custom stateful operator body: accumulate per-user event count and
    value total across micro-batches (state survives between triggers)."""
    if state.hasTimedOut:
        n, total = state.get
        state.remove()
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )
        return
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    running per-user count/total, emitted each micro-batch. The state store
    is keyed by user — it partitions and scales like any keyed state."""
    return events.groupBy("user_id").applyInPandasWithState(
        _totals_fn,
        outputStructType=_TOTALS_OUT,
        stateStructType=_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class _RunningTotalsProcessor:
    """``StatefulProcessor`` twin of ``running_user_totals`` on Spark 4's
    ``transformWithState`` API: explicit named state (a single ValueState
    here), timer support, and a RocksDB-backed store with changelog
    checkpointing — the forward-looking home for custom streaming state
    (list/map state and TTL hang off the same handle when an operator
    needs them). Requires
    ``spark.sql.streaming.stateStore.providerClass =
    ...state.RocksDBStateStoreProvider`` and the ``protobuf`` Python
    package (the transformWithState state-server protocol; absent from
    this container, so the covering test skip-gates on it — same
    environment-gate policy as the Delta/Iceberg connectors)."""

    def init(self, handle) -> None:  # StatefulProcessorHandle
        self._agg = handle.getValueState("agg", "n BIGINT, total DOUBLE")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, total = self._agg.get() if self._agg.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        self._agg.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` version of ``running_user_totals`` —
    identical semantics (running per-user count/total, one row per updated
    user per micro-batch), expressed as a ``StatefulProcessor`` so state is
    named, typed, and RocksDB-resident (changelog checkpoints instead of
    full-store snapshots — the 100 TB-stream state story)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclass dynamically so importing this module never requires the
    # stateful_processor module (present since Spark 4.0); exclude the
    # __dict__/__weakref__ getset descriptors — copying them into the new
    # class breaks cloudpickle when Spark ships the processor to workers
    namespace = {
        k: v
        for k, v in _RunningTotalsProcessor.__dict__.items()
        if k not in ("__dict__", "__weakref__")
    }
    proc = type("RunningTotalsProcessor", (StatefulProcessor,), namespace)()
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=_TOTALS_OUT,
        outputMode="update",
        timeMode="none",
    )


def click_purchase_join(
    events: DataFrame,
    max_gap: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join (attribution): each click joins the same
    user's purchases landing within ``max_gap`` AFTER the click. Both sides
    carry a watermark and the join condition bounds event-time distance, so
    Spark can evict join state once the watermark passes click_ts + max_gap
    — bounded state on an unbounded stream. Batch twin (oracle-checked):
    queries/events.attribution_click_purchase.

    ``how='left_outer'`` is the unattributed-click variant: a click with NO
    purchase in its window is emitted with NULL purchase columns — but only
    once the watermark has passed the end of its join window (Spark must
    prove no future purchase can match before it can emit the null row), so
    outer results trail the inner ones by up to watermark + max_gap. Same
    state bound; the standard funnel-leak detector."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap}")),
        how,
    ).select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )
