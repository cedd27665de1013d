"""Structured Streaming tests: incremental file-source replay of the events
table through windows/sessions/dedup/custom state, with a late-data probe.

Pattern: write event batches as parquet files into a stream source dir, run
the streaming query with a memory sink, processAllAvailable() per batch, and
assert on the sink table."""

from __future__ import annotations

import datetime as dt
import uuid

import pytest

from pyspark.sql import functions as F

from evolution_spark.streaming import (
    dedup_events,
    read_event_stream,
    running_user_totals,
    session_agg,
    sliding_counts,
    tumbling_counts,
)
from evolution_spark.streaming.events import EVENT_SCHEMA

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk_events(spark, rows):
    """rows: (event_id, minutes_offset, user_id, type, value)"""
    data = [
        (eid, T0 + dt.timedelta(minutes=m), uid, et, val, None)
        for (eid, m, uid, et, val) in rows
    ]
    return spark.createDataFrame(data, EVENT_SCHEMA)


@pytest.fixture()
def stream_env(spark, tmp_path):
    src = tmp_path / "events_src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"

    def add_batch(rows):
        _mk_events(spark, rows).coalesce(1).write.mode("append").parquet(str(src))

    return str(src), str(ckpt), add_batch


def _run_to_memory(df, name, ckpt, mode):
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .start()
    )


def test_tumbling_window_with_late_data_drop(spark, stream_env):
    src, ckpt, add_batch = stream_env
    add_batch([(1, 10, 1, "view", 1.0), (2, 70, 1, "view", 2.0)])
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = _run_to_memory(
        tumbling_counts(read_event_stream(spark, src), "1 hour", "1 hour"),
        name, ckpt, "append",
    )
    try:
        q.processAllAvailable()
        # advance watermark far beyond hour 0 and 1 so both windows close
        add_batch([(3, 300, 2, "click", 5.0)])
        q.processAllAvailable()
        # LATE: an hour-0 event arriving after the watermark passed -> dropped
        add_batch([(4, 5, 3, "view", 100.0)])
        q.processAllAvailable()
        add_batch([(5, 400, 2, "click", 1.0)])
        q.processAllAvailable()
        out = {
            (r.window_start.minute + 60 * r.window_start.hour, r.event_type): (r.n, r.sum_value)
            for r in spark.table(name).collect()
        }
        assert out[(0, "view")] == (1, 1.0)   # late event 4 NOT counted
        assert out[(60, "view")] == (1, 2.0)
    finally:
        q.stop()


def test_session_window_stream(spark, stream_env):
    src, ckpt, add_batch = stream_env
    # user 1: events at 0 and 10 min (one session), then 120 min (new session)
    add_batch([(1, 0, 1, "view", 1.0), (2, 10, 1, "view", 2.0), (3, 120, 1, "view", 3.0)])
    name = f"s_{uuid.uuid4().hex[:8]}"
    q = _run_to_memory(
        session_agg(read_event_stream(spark, src), gap="30 minutes", watermark="10 minutes"),
        name, ckpt, "append",
    )
    try:
        q.processAllAvailable()
        add_batch([(4, 600, 9, "view", 0.0)])  # push watermark, close sessions
        q.processAllAvailable()
        rows = [r for r in spark.table(name).collect() if r.user_id == 1]
        sessions = sorted((r.n_events, r.sum_value) for r in rows)
        assert (2, 3.0) in sessions  # the 0+10min session
        assert (1, 3.0) in sessions  # the 120min session
    finally:
        q.stop()


def test_streaming_dedup_within_watermark(spark, stream_env):
    src, ckpt, add_batch = stream_env
    add_batch([(1, 0, 1, "view", 1.0), (1, 1, 1, "view", 1.0)])  # dup ids in batch
    name = f"d_{uuid.uuid4().hex[:8]}"
    q = _run_to_memory(
        dedup_events(read_event_stream(spark, src), watermark="1 hour"),
        name, ckpt, "append",
    )
    try:
        q.processAllAvailable()
        add_batch([(1, 2, 1, "view", 1.0), (2, 3, 1, "click", 2.0)])  # dup again + new
        q.processAllAvailable()
        ids = sorted(r.event_id for r in spark.table(name).collect())
        assert ids == [1, 2]
    finally:
        q.stop()


def test_running_user_totals_stateful(spark, stream_env):
    src, ckpt, add_batch = stream_env
    add_batch([(1, 0, 1, "view", 1.0), (2, 1, 2, "view", 10.0)])
    name = f"u_{uuid.uuid4().hex[:8]}"
    q = _run_to_memory(
        running_user_totals(read_event_stream(spark, src)), name, ckpt, "update"
    )
    try:
        q.processAllAvailable()
        add_batch([(3, 2, 1, "click", 4.0)])
        q.processAllAvailable()
        # memory sink in update mode appends updated rows; take the last per user
        rows = spark.table(name).collect()
        latest = {}
        for r in rows:
            latest[r.user_id] = (r.n_events, r.total_value)
        assert latest[1] == (2, 5.0)   # state carried across micro-batches
        assert latest[2] == (1, 10.0)
    finally:
        q.stop()


def test_sliding_counts_stream(spark, stream_env):
    src, ckpt, add_batch = stream_env
    add_batch([(1, 45, 1, "view", 2.0)])  # lands in windows starting at 0:00 and 0:30
    name = f"w_{uuid.uuid4().hex[:8]}"
    q = _run_to_memory(
        sliding_counts(read_event_stream(spark, src), "1 hour", "30 minutes", "30 minutes"),
        name, ckpt, "append",
    )
    try:
        q.processAllAvailable()
        add_batch([(2, 500, 9, "view", 0.0)])  # close windows
        q.processAllAvailable()
        starts = sorted(
            r.window_start.minute + 60 * r.window_start.hour
            for r in spark.table(name).collect()
            if r.n == 1 and r.sum_value == 2.0
        )
        assert starts == [0, 30]
    finally:
        q.stop()


def test_streaming_flf_conversion(spark, tmp_path):
    """The reference's convert workload as a stream: FLF files landing
    incrementally -> typed parquet, exactly-once."""
    from evolution_spark.schema import FixedSchema
    from evolution_spark.streaming.flf_stream import convert_flf_stream

    sch = FixedSchema.from_dict(
        {"name": "s", "version": 1, "columns": [
            {"name": "id", "offset": 0, "length": 6, "dtype": "Int32", "is_nullable": False},
            {"name": "name", "offset": 6, "length": 10, "dtype": "Utf8",
             "alignment": "Left", "is_nullable": True}]}
    )
    src = tmp_path / "flf_src"; src.mkdir()
    out = str(tmp_path / "flf_out"); ckpt = str(tmp_path / "flf_ckpt")

    (src / "a.flf").write_text("     1alice     \n     2bob       \n")
    q = convert_flf_stream(spark, str(src), sch, out, ckpt)
    try:
        q.processAllAvailable()
        (src / "b.flf").write_text("     3carol     \n")
        q.processAllAvailable()
        rows = sorted((r.id, r.name) for r in spark.read.parquet(out).collect())
        assert rows == [(1, "alice"), (2, "bob"), (3, "carol")]
        got = dict(spark.read.parquet(out).dtypes)
        assert got["id"] == "int" and got["name"] == "string"
    finally:
        q.stop()


def test_stream_static_join(spark, stream_env, tmp_path):
    from evolution_spark.streaming.flf_stream import enrich_events_with_dims

    src, ckpt, add_batch = stream_env
    add_batch([(1, 0, 7, "view", 1.0), (2, 1, 99, "view", 2.0)])
    dims = spark.createDataFrame([(7, "gold")], ["user_id", "tier"])
    stream = read_event_stream(spark, src)
    import uuid
    name = f"j_{uuid.uuid4().hex[:8]}"
    q = (
        enrich_events_with_dims(stream, dims, "user_id")
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", str(tmp_path / "jckpt"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        out = {r.event_id: r.tier for r in spark.table(name).collect()}
        assert out == {1: "gold", 2: None}
    finally:
        q.stop()


def test_stream_stream_interval_join(spark, stream_env):
    from evolution_spark.streaming.events import click_purchase_join

    src, ckpt, add_batch = stream_env
    # user 1: click at 0 -> purchase at 10 (match) and 50 (outside 30min gap)
    # user 2: purchase at 5 with no click -> no match
    add_batch([(1, 0, 1, "click", 0.0), (2, 10, 1, "purchase", 9.99)])
    name = f"j_{uuid.uuid4().hex[:8]}"
    q = _run_to_memory(
        click_purchase_join(read_event_stream(spark, src), "30 minutes", "1 hour"),
        name, ckpt, "append",
    )
    try:
        q.processAllAvailable()
        add_batch([(3, 50, 1, "purchase", 5.0), (4, 5, 2, "purchase", 1.0)])
        q.processAllAvailable()
        rows = spark.table(name).collect()
        pairs = sorted((r.click_id, r.purchase_id, r.purchase_value) for r in rows)
        assert pairs == [(1, 2, 9.99)]
    finally:
        q.stop()


def test_idempotent_foreachbatch_sink(spark, stream_env, tmp_path):
    """Replaying a micro-batch (restart from the same checkpoint before the
    sink's output was recorded) must not duplicate rows: each batch
    overwrites its own batch_id directory."""
    from evolution_spark.streaming.sinks import idempotent_parquet_sink

    src, ckpt, add_batch = stream_env
    out = str(tmp_path / "idem_out")
    add_batch([(1, 0, 1, "view", 1.0), (2, 5, 1, "click", 2.0)])

    def run_once():
        q = (
            read_event_stream(spark, src)
            .writeStream.foreachBatch(idempotent_parquet_sink(out))
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    first = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert first == [1, 2]
    # simulate a replay: re-run batch 0's write function directly (what a
    # post-crash restart does when the batch committed upstream but the
    # sink's effect is in doubt)
    batch0 = spark.read.parquet(f"{src}")
    idempotent_parquet_sink(out)(batch0, 0)
    replayed = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert replayed == [1, 2]  # no duplicates
    # new data in a later batch lands in a new batch_id dir
    add_batch([(3, 10, 2, "view", 3.0)])
    run_once()
    final = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert final == [1, 2, 3]


def test_partitioned_rollup_sink_incremental_late_and_replay(spark, stream_env, tmp_path):
    """Day-partitioned rollup contributions: two micro-batches (the second
    carrying LATE data for day 1) merge to the same totals as a single
    batch groupBy; replaying a batch changes nothing (idempotence); day-1
    files from batch 0 are never rewritten by batch 1."""
    import glob
    import os

    from evolution_spark.streaming.sinks import (
        partitioned_rollup_sink,
        read_partitioned_rollup,
    )

    src, ckpt, add_batch = stream_env
    out = str(tmp_path / "rollup_out")
    sink = partitioned_rollup_sink(out, "day", ["event_type"], ["value"])

    def run_once():
        stream = read_event_stream(spark, src).withColumn("day", F.to_date("ts"))
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    # batch 0: day 1 only (minutes < 1440); batch 1: day 2 + LATE day-1 row
    b0 = [(1, 0, 1, "view", 1.0), (2, 60, 1, "view", 3.0), (3, 120, 2, "click", 5.0)]
    b1 = [(4, 1500, 1, "view", 7.0), (5, 30, 2, "view", 9.0)]  # 5 is late day-1
    add_batch(b0)
    run_once()
    d1_files_after_b0 = sorted(
        (f, os.path.getmtime(f))
        for f in glob.glob(f"{out}/day=2024-01-01/batch_id=0/*.parquet")
    )
    add_batch(b1)
    run_once()

    got = {
        (str(r.day), r.event_type): (r.n, r.sum_value)
        for r in read_partitioned_rollup(
            spark, out, "day", ["event_type"], ["value"]
        ).collect()
    }
    assert got == {
        ("2024-01-01", "view"): (3, 13.0),   # includes the late row
        ("2024-01-01", "click"): (1, 5.0),
        ("2024-01-02", "view"): (1, 7.0),
    }
    # batch 0's day-1 contribution files are untouched by batch 1 (the late
    # row landed under day=2024-01-01/batch_id=1)
    assert sorted(
        (f, os.path.getmtime(f))
        for f in glob.glob(f"{out}/day=2024-01-01/batch_id=0/*.parquet")
    ) == d1_files_after_b0
    assert glob.glob(f"{out}/day=2024-01-01/batch_id=1/*.parquet")
    # replay: re-apply batch 1's write; totals must not change
    replay_df = _mk_events(spark, b1).withColumn("day", F.to_date("ts"))
    sink(replay_df, 1)
    again = {
        (str(r.day), r.event_type): (r.n, r.sum_value)
        for r in read_partitioned_rollup(
            spark, out, "day", ["event_type"], ["value"]
        ).collect()
    }
    assert again == got


def test_scd2_upsert_sink_incremental_equals_batch(spark, tmp_path):
    """Incrementally maintained SCD2 (3 micro-batches) must equal one batch
    scd2_from_changelog over the concatenated changelog; replaying a batch
    must not change the result (idempotence)."""
    from evolution_spark.operators.temporal import scd2_from_changelog
    from evolution_spark.streaming.sinks import read_scd2_dimension, scd2_upsert_sink

    dim = str(tmp_path / "dim")
    batches = [
        [(1, 10, 100, "a"), (2, 20, 101, "a"), (1, 30, 102, "b")],
        [(1, 40, 103, "b"), (2, 50, 104, "c"), (3, 60, 105, "x")],
        [(1, 70, 106, "a"), (3, 80, 107, "x"), (2, 90, 108, "a")],
    ]
    schema = "key int, ts int, seq int, status string"
    sink = scd2_upsert_sink(dim, key="key", order_col="ts",
                            attr_cols=["status"], tiebreak="seq")
    for i, rows in enumerate(batches):
        sink(spark.createDataFrame(rows, schema), i)
    # replay batch 2 (at-least-once delivery) — must be a no-op
    sink(spark.createDataFrame(batches[2], schema), 2)

    got = read_scd2_dimension(spark, dim)
    full = spark.createDataFrame([r for b in batches for r in b], schema)
    want = scd2_from_changelog(full, "key", "ts", ["status"], tiebreak="seq")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # exactly one open interval per key
    opens = got.where("is_current").groupBy("key").count().collect()
    assert all(r["count"] == 1 for r in opens)


def test_scd2_upsert_sink_from_real_stream(spark, stream_env, tmp_path):
    """The sink under an actual readStream: file-source micro-batches of the
    events schema maintain a user_id/event_type dimension."""
    from evolution_spark.streaming.sinks import read_scd2_dimension, scd2_upsert_sink

    src, ckpt, add_batch = stream_env
    dim = str(tmp_path / "dim")
    stream = read_event_stream(spark, src)
    q = (
        stream.writeStream.foreachBatch(
            scd2_upsert_sink(dim, key="user_id", order_col="ts",
                             attr_cols=["event_type"], tiebreak="event_id")
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        add_batch([(1, 0, 7, "view", 1.0), (2, 5, 7, "click", 2.0)])
        q.processAllAvailable()
        add_batch([(3, 10, 7, "click", 3.0), (4, 15, 7, "buy", 4.0)])
        q.processAllAvailable()
    finally:
        q.stop()
    got = read_scd2_dimension(spark, dim)
    rows = sorted(
        got.select("event_type", "is_current").collect(), key=lambda r: r[0]
    )
    # view -> click (collapsed across batches) -> buy
    assert [(r[0], r[1]) for r in rows] == [
        ("buy", True), ("click", False), ("view", False),
    ]


def test_scd2_upsert_sink_late_event_rewrites_only_open_regime(spark, tmp_path):
    """A late event older than a key's OPEN interval start reorders the open
    regime (documented semantics) while closed intervals stay immutable."""
    from evolution_spark.streaming.sinks import read_scd2_dimension, scd2_upsert_sink

    dim = str(tmp_path / "dim")
    schema = "key int, ts int, seq int, status string"
    sink = scd2_upsert_sink(dim, key="key", order_col="ts",
                            attr_cols=["status"], tiebreak="seq")
    # batch 0: a@10 -> b@30  (a closes at 30, b open from 30)
    sink(spark.createDataFrame([(1, 10, 100, "a"), (1, 30, 101, "b")], schema), 0)
    closed_before = sorted(
        (r.status, r.valid_from, r.valid_to)
        for r in read_scd2_dimension(spark, dim).where("NOT is_current").collect()
    )
    # batch 1: late c@20 — older than the open b@30 but newer than closed a's
    # start; it lands between the open re-entry (b@30) and nothing else, so
    # the open-regime window re-sorts to c@20 -> b@30
    sink(spark.createDataFrame([(1, 20, 102, "c")], schema), 1)
    got = sorted(
        (r.status, r.valid_from, r.valid_to, r.is_current)
        for r in read_scd2_dimension(spark, dim).collect()
    )
    # closed history from batch 0 is untouched
    assert closed_before == [("a", 10, 30)]
    assert ("a", 10, 30, False) in got
    # late c closed at 30 by b; b reopened from 30
    assert ("c", 20, 30, False) in got
    assert ("b", 30, None, True) in got


def test_tws_processor_survives_cloudpickle(spark):
    """The dynamically-built StatefulProcessor subclass must cloudpickle
    round-trip — Spark ships the processor instance to Python workers, and
    copying ``__dict__``/``__weakref__`` descriptors into the subclass
    namespace broke that (round-3 advisor finding). Runs even without
    protobuf: pickling needs no state server."""
    from pyspark.serializers import CloudPickleSerializer

    from evolution_spark.streaming import events as sev

    pytest.importorskip("pyspark.sql.streaming.stateful_processor")
    df = spark.createDataFrame([(1, 2.0)], "user_id int, value double")
    plan = sev.running_user_totals_tws(df)  # builds the subclass instance
    assert plan is not None
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    ns = {
        k: v
        for k, v in sev._RunningTotalsProcessor.__dict__.items()
        if k not in ("__dict__", "__weakref__")
    }
    proc = type("RunningTotalsProcessor", (StatefulProcessor,), ns)()
    ser = CloudPickleSerializer()
    clone = ser.loads(ser.dumps(proc))
    import pandas as pd

    out = list(
        clone.handleInputRows.__func__(
            _FakeState(), (1,), iter([pd.DataFrame({"value": [2.0, 3.0]})]), None
        )
    )
    assert out[0].iloc[0]["n_events"] == 2
    assert out[0].iloc[0]["total_value"] == 5.0


class _FakeState:
    """Minimal stand-in for the StatefulProcessor handle/state used by the
    cloudpickle test: exercises handleInputRows without a state server."""

    def exists(self):
        return False

    def get(self):  # pragma: no cover - unused when exists() is False
        return (0, 0.0)

    def update(self, v):
        self.value = v

    @property
    def _agg(self):
        return self


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState's Python state-server protocol needs protobuf, "
    "absent from this container (environment-gated like the Delta/Iceberg jars)",
)
def test_running_user_totals_transform_with_state(spark, stream_env):
    """transformWithStateInPandas twin: same running totals, state carried
    across micro-batches in a RocksDB ValueState."""
    from evolution_spark.streaming.events import running_user_totals_tws

    src, ckpt, add_batch = stream_env
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        add_batch([(1, 0, 1, "view", 1.0), (2, 1, 2, "view", 10.0)])
        name = f"tws_{uuid.uuid4().hex[:8]}"
        q = _run_to_memory(
            running_user_totals_tws(read_event_stream(spark, src)), name, ckpt, "update"
        )
        try:
            q.processAllAvailable()
            add_batch([(3, 2, 1, "click", 4.0)])
            q.processAllAvailable()
            latest = {}
            for r in spark.table(name).collect():
                latest[r.user_id] = (r.n_events, r.total_value)
            assert latest[1] == (2, 5.0)
            assert latest[2] == (1, 10.0)
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_delta_append_sink_exactly_once_and_time_travel(spark, stream_env, tmp_path):
    """Streaming appends into the native Delta table: replayed batches are
    skipped via the spec's txn action (exactly-once, including batch 0 on
    a fresh table), and time travel shows the stream's prefix."""
    from evolution_spark.io.delta_log import last_txn_version, read_delta_snapshot
    from evolution_spark.streaming.sinks import delta_append_sink

    src, ckpt, add_batch = stream_env
    tbl = str(tmp_path / "delta_stream")
    sink = delta_append_sink(tbl, app_id="q1")

    add_batch([(1, 0, 1, "view", 1.0), (2, 5, 1, "click", 2.0)])

    def run_once():
        q = (
            read_event_stream(spark, src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    assert sorted(r.event_id for r in read_delta_snapshot(spark, tbl).collect()) == [1, 2]
    assert last_txn_version(tbl, "q1") == 0

    # replay batch 0 (post-crash in-doubt delivery): must be a no-op —
    # this covers the fresh-table path where version 0 carries the txn
    batch0 = spark.read.parquet(src)
    sink(batch0, 0)
    assert sorted(r.event_id for r in read_delta_snapshot(spark, tbl).collect()) == [1, 2]

    add_batch([(3, 10, 2, "view", 3.0)])
    run_once()
    latest = read_delta_snapshot(spark, tbl)
    assert sorted(r.event_id for r in latest.collect()) == [1, 2, 3]
    assert last_txn_version(tbl, "q1") == 1
    # time travel: version 0 is exactly the first micro-batch
    v0 = read_delta_snapshot(spark, tbl, version=0)
    assert sorted(r.event_id for r in v0.collect()) == [1, 2]
    # a different app_id has no txn history here
    assert last_txn_version(tbl, "other") is None


def test_tws_processor_cloudpickle_roundtrip():
    """The dynamically-built StatefulProcessor subclass must survive the
    exact serialization Spark performs when shipping it to workers
    (cloudpickle) — this is the protobuf-free repro of the descriptor bug:
    copying __dict__/__weakref__ getset descriptors into the subclass
    namespace makes cloudpickle raise. Runs without a streaming query, so
    it covers the fix even in containers without protobuf."""
    pytest.importorskip("pyspark.sql.streaming.stateful_processor")
    import cloudpickle
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from evolution_spark.streaming.events import _RunningTotalsProcessor

    namespace = {
        k: v
        for k, v in _RunningTotalsProcessor.__dict__.items()
        if k not in ("__dict__", "__weakref__")
    }
    proc = type("RunningTotalsProcessor", (StatefulProcessor,), namespace)()
    blob = cloudpickle.dumps(proc)          # what Spark does at plan time
    clone = cloudpickle.loads(blob)         # what the worker does

    # behavioral check on the deserialized clone: drive handleInputRows
    # with a fake ValueState and verify the running aggregate
    class FakeState:
        def __init__(self):
            self.v = None
        def exists(self):
            return self.v is not None
        def get(self):
            return self.v
        def update(self, v):
            self.v = v

    clone._agg = FakeState()
    out1 = list(clone.handleInputRows(
        ("u1",), iter([pd.DataFrame({"value": [1.0, 2.0]})]), None))
    out2 = list(clone.handleInputRows(
        ("u1",), iter([pd.DataFrame({"value": [4.0]})]), None))
    assert out1[0].iloc[0]["n_events"] == 2
    assert out2[0].iloc[0]["n_events"] == 3
    assert out2[0].iloc[0]["total_value"] == 7.0


def test_stream_stream_left_outer_join_emits_unmatched(spark, stream_env):
    """left_outer attribution: clicks with no purchase in their window are
    emitted with NULL purchase columns, but only after the watermark
    proves no future purchase can match (watermark + max_gap past the
    click)."""
    from evolution_spark.streaming.events import click_purchase_join

    src, ckpt, add_batch = stream_env
    # user 1: click at 0 min -> purchase at 10 (matched)
    # user 2: click at 1 min -> NO purchase ever (unmatched, must surface)
    add_batch([(1, 0, 1, "click", 0.0),
               (2, 1, 2, "click", 0.0),
               (3, 10, 1, "purchase", 9.99)])
    name = f"lo_{uuid.uuid4().hex[:8]}"
    q = _run_to_memory(
        click_purchase_join(read_event_stream(spark, src),
                            "30 minutes", "10 minutes", how="left_outer"),
        name, ckpt, "append",
    )
    try:
        q.processAllAvailable()
        # advance BOTH sides' watermarks far past click(1min) + gap(30) +
        # watermark(10): the global watermark is the min of the two input
        # watermarks, and each only advances from rows that pass its type
        # filter — a 'view' event would advance neither
        add_batch([(9, 600, 3, "click", 0.0), (10, 600, 3, "purchase", 0.0)])
        q.processAllAvailable()
        add_batch([(11, 610, 3, "click", 0.0), (12, 610, 3, "purchase", 0.0)])
        q.processAllAvailable()
        rows = spark.table(name).collect()
        got = {(r.click_id, r.purchase_id) for r in rows}
        assert (1, 3) in got, f"matched pair missing: {got}"
        assert (2, None) in got, f"unmatched click not emitted: {got}"
    finally:
        q.stop()


def test_streaming_contract_monitor(spark, stream_env, tmp_path):
    """Per-micro-batch contract violation counts land under batch_id=N,
    idempotent on replay; rule semantics match the batch operator."""
    from evolution_spark.streaming.sinks import contract_monitor_sink

    src, ckpt, add_batch = stream_env
    out = str(tmp_path / "contract_out")
    rules = [
        ("value_positive", F.col("value") > 0),
        ("type_enum", F.col("event_type").isin("view", "click", "purchase")),
    ]
    add_batch([(1, 0, 1, "view", 1.0), (2, 1, 1, "bogus", -2.0)])
    q = (
        read_event_stream(spark, src)
        .writeStream.foreachBatch(contract_monitor_sink(rules, out))
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        add_batch([(3, 2, 2, "click", 5.0)])
        q.processAllAvailable()
    finally:
        q.stop()
    rep = spark.read.parquet(out)
    got = {
        (r.batch_id, r.rule): (r.n_violations, r.n_rows) for r in rep.collect()
    }
    assert got[(0, "value_positive")] == (1, 2)
    assert got[(0, "type_enum")] == (1, 2)
    assert got[(1, "value_positive")] == (0, 1)
    assert got[(1, "type_enum")] == (0, 1)
