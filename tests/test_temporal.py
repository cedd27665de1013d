"""asof_join / range_join operator semantics on hand-built frames."""

from __future__ import annotations

import datetime as dt

import pytest

from evolution_spark.operators.temporal import asof_join, range_join


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        ("A", ts(9), 10.0), ("A", ts(11), 11.0),
        ("B", ts(10), 20.0),
    ]
    return spark.createDataFrame(rows, ["sym", "t", "price"])


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("A", ts(8), 5), ("A", ts(9), 1), ("A", ts(10), 2), ("A", ts(12), 3),
        ("B", ts(9, 30), 4), ("B", ts(10), 6),
    ]
    return spark.createDataFrame(rows, ["sym", "t", "qty"])


def test_asof_backward(spark, quotes, trades):
    out = {(r.sym, r.t.hour, r.t.minute): r.price
           for r in asof_join(trades, quotes, on="t", by="sym").collect()}
    assert out[("A", 8, 0)] is None          # no quote yet
    assert out[("A", 9, 0)] == 10.0          # exact tie matches (<=)
    assert out[("A", 10, 0)] == 10.0         # carried forward
    assert out[("A", 12, 0)] == 11.0         # latest quote
    assert out[("B", 9, 30)] is None
    assert out[("B", 10, 0)] == 20.0


def test_asof_forward(spark, quotes, trades):
    out = {(r.sym, r.t.hour, r.t.minute): r.price
           for r in asof_join(trades, quotes, on="t", by="sym", direction="forward").collect()}
    assert out[("A", 8, 0)] == 10.0          # next quote
    assert out[("A", 10, 0)] == 11.0
    assert out[("A", 12, 0)] is None         # nothing after
    assert out[("B", 9, 30)] == 20.0


def test_asof_without_by_key(spark):
    left = spark.createDataFrame([(ts(10), 1), (ts(12), 2)], ["t", "lid"])
    right = spark.createDataFrame([(ts(9), "x"), (ts(11), "y")], ["t", "tag"])
    out = {r.lid: r.tag for r in asof_join(left, right, on="t").collect()}
    assert out == {1: "x", 2: "y"}


def test_asof_name_collision_gets_suffix(spark, quotes, trades):
    q = quotes.withColumnRenamed("price", "qty")  # collides with trades.qty
    out = asof_join(trades, q, on="t", by="sym")
    assert "qty" in out.columns and "qty_right" in out.columns


def test_range_join_contains(spark):
    events = spark.createDataFrame(
        [(1, ts(9, 30)), (2, ts(10, 30)), (3, ts(23, 59))], ["eid", "t"]
    )
    windows = spark.createDataFrame(
        [("w1", ts(9), ts(10)), ("w2", ts(9), ts(12))], ["wid", "start", "end"]
    )
    out = {(r.eid, r.wid) for r in
           range_join(events, windows, "t", "start", "end", bin_width_seconds=1800).collect()}
    assert out == {(1, "w1"), (1, "w2"), (2, "w2")}


def test_range_join_boundary_semantics(spark):
    # [start, end): start inclusive, end exclusive
    events = spark.createDataFrame([(1, ts(9)), (2, ts(10))], ["eid", "t"])
    windows = spark.createDataFrame([("w", ts(9), ts(10))], ["wid", "start", "end"])
    out = {r.eid for r in range_join(events, windows, "t", "start", "end").collect()}
    assert out == {1}


def test_range_join_wide_interval_fanout(spark):
    # interval spanning many bins still matches exactly once
    events = spark.createDataFrame([(1, ts(15))], ["eid", "t"])
    windows = spark.createDataFrame([("w", ts(8), ts(23))], ["wid", "start", "end"])
    rows = range_join(events, windows, "t", "start", "end", bin_width_seconds=600).collect()
    assert len(rows) == 1


def test_asof_matched_row_nulls_survive(spark):
    # a matched right row's genuine NULL must NOT be replaced by a stale
    # value from an earlier right row (struct-packed fill, not per-column)
    left = spark.createDataFrame([("a", 10, "L1")], "sym string, t int, lid string")
    right = spark.createDataFrame(
        [("a", 1, "old-tag", 100), ("a", 5, None, 200)],
        "sym string, t int, tag string, px int",
    )
    row = asof_join(left, right, on="t", by="sym").collect()[0]
    assert row.px == 200          # matched row t=5
    assert row.tag is None        # its NULL tag survives (not "old-tag")


def test_asof_all_columns_from_same_right_row(spark):
    # per-column fill could stitch tag from row A and px from row B when
    # each has a different NULL; the struct fill keeps rows atomic
    left = spark.createDataFrame([("a", 10, "L1")], "sym string, t int, lid string")
    right = spark.createDataFrame(
        [("a", 1, "t1", None), ("a", 5, None, 500)],
        "sym string, t int, tag string, px int",
    )
    row = asof_join(left, right, on="t", by="sym").collect()[0]
    assert (row.tag, row.px) == (None, 500)  # the t=5 row, atomically


def test_asof_tie_is_deterministic(spark):
    # two right rows at the same (by, on): repeated runs must pick the same
    # one (hash-of-payload tiebreak)
    left = spark.createDataFrame([("a", 10, "L1")], "sym string, t int, lid string")
    right = spark.createDataFrame(
        [("a", 5, "x"), ("a", 5, "y")], "sym string, t int, tag string"
    )
    picks = {
        asof_join(left, right.repartition(n), on="t", by="sym").collect()[0].tag
        for n in (1, 2, 4, 8)
    }
    assert len(picks) == 1


def test_asof_without_by_distributed_partition_invariant(spark):
    """by=None is fully distributed (range repartition + boundary carry,
    no single global window partition) and the result is invariant to the
    shuffle-partition count — boundaries decide WHERE a row fills, never
    WHAT it matches. Brute-force python oracle, both directions."""
    import random

    rnd = random.Random(7)
    lrows = [(i * 7 + rnd.randint(0, 6), i) for i in range(300)]
    rts = rnd.sample(range(0, 2400), 120)  # unique right timestamps: no ties
    rrows = [(t, float(t) / 2) for t in rts]
    left = spark.createDataFrame(lrows, "t bigint, lid bigint")
    right = spark.createDataFrame(rrows, "t bigint, rv double")

    def brute(direction):
        out = {}
        for t, lid in lrows:
            if direction == "backward":
                cand = [rt for rt in rts if rt <= t]
                out[lid] = max(cand) / 2 if cand else None
            else:
                cand = [rt for rt in rts if rt >= t]
                out[lid] = min(cand) / 2 if cand else None
        return out

    prior = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for direction in ("backward", "forward"):
            want = brute(direction)
            results = []
            for n_part in ("3", "17"):
                spark.conf.set("spark.sql.shuffle.partitions", n_part)
                df = asof_join(left, right, on="t", direction=direction)
                got = {r.lid: r.rv for r in df.collect()}
                assert got == want, (direction, n_part)
                results.append(got)
            assert results[0] == results[1]
            # the fill is range-partitioned, not one global window partition
            plan = df._jdf.queryExecution().executedPlan().toString().lower()
            assert "rangepartitioning" in plan
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)


# ---------------------------------------------------------------------------
# SCD2 from changelog
# ---------------------------------------------------------------------------

def test_scd2_collapses_consecutive_repeats(spark):
    from evolution_spark.operators.temporal import scd2_from_changelog

    rows = [
        (1, 10, 100, "a"),
        (1, 20, 101, "a"),   # no-op update: collapses into the first regime
        (1, 30, 102, "b"),
        (1, 40, 103, "a"),   # a reappears: NEW regime, not merged with row 1
        (2, 10, 104, "x"),
    ]
    df = spark.createDataFrame(rows, "key int, ts int, seq int, status string")
    out = scd2_from_changelog(df, "key", "ts", ["status"], tiebreak="seq")
    got = sorted(
        out.select("key", "status", "valid_from", "valid_to", "is_current").collect()
    )
    assert [tuple(r) for r in got] == [
        (1, "a", 10, 30, False),
        (1, "a", 40, None, True),
        (1, "b", 30, 40, False),
        (2, "x", 10, None, True),
    ]


def test_scd2_null_transitions_are_changes(spark):
    from evolution_spark.operators.temporal import scd2_from_changelog

    rows = [(1, 10, 1, "a"), (1, 20, 2, None), (1, 30, 3, None), (1, 40, 4, "a")]
    df = spark.createDataFrame(rows, "key int, ts int, seq int, status string")
    out = scd2_from_changelog(df, "key", "ts", ["status"], tiebreak="seq")
    got = sorted(out.collect(), key=lambda r: r.valid_from)
    assert [(r.status, r.valid_from, r.valid_to) for r in got] == [
        ("a", 10, 20),
        (None, 20, 40),  # the two consecutive NULL rows collapse
        ("a", 40, None),
    ]


def test_scd2_intervals_tile_the_timeline(spark):
    """Intervals per key are contiguous: each valid_to equals the next
    valid_from, exactly one open (is_current) interval per key."""
    from evolution_spark.operators.temporal import scd2_from_changelog

    # events.ts is TIMESTAMP(NANOS): read via the queries helper
    from evolution_spark.queries.base import table

    e = table(spark, "/root/testdata/sf0.001", "events")
    out = scd2_from_changelog(
        e.select("user_id", "ts", "event_id", "event_type"),
        key="user_id",
        order_col="ts",
        attr_cols=["event_type"],
        tiebreak="event_id",
    ).cache()
    per_key = out.groupBy("user_id").count().collect()
    assert len(per_key) > 0
    import pyspark.sql.functions as F

    open_per_key = out.where("is_current").groupBy("user_id").count().collect()
    assert all(r["count"] == 1 for r in open_per_key)
    # tiling: sort intervals per key, valid_to[i] == valid_from[i+1]
    rows = out.orderBy("user_id", "valid_from").collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r.user_id, []).append(r)
    for ivs in by_key.values():
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from
        assert ivs[-1].valid_to is None
    out.unpersist()


def test_asof_tolerance_discards_far_matches(spark):
    from evolution_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 50)], "k int, t int"
    )
    right = spark.createDataFrame(
        [(1, 95, "near"), (1, 120, "mid"), (2, 10, "far")], "k int, t int, v string"
    )
    out = {
        (r.k, r.t): r.v
        for r in asof_join(left, right, on="t", by="k", tolerance=10).collect()
    }
    # (1,100): match t=95, gap 5 <= 10 -> kept
    # (1,200): nearest prior is t=120, gap 80 -> nulled
    # (2,50): nearest prior t=10, gap 40 -> nulled
    assert out == {(1, 100): "near", (1, 200): None, (2, 50): None}


def test_asof_tolerance_forward(spark):
    from evolution_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 100)], "k int, t int")
    right = spark.createDataFrame([(1, 104, "x")], "k int, t int, v string")
    hit = asof_join(left, right, on="t", by="k", direction="forward", tolerance=5)
    miss = asof_join(left, right, on="t", by="k", direction="forward", tolerance=3)
    assert hit.first().v == "x" and miss.first().v is None


def test_sessionize_gaps_and_islands(spark):
    from evolution_spark.operators.temporal import sessionize

    rows = [
        (1, 0, 1), (1, 10, 2), (1, 50, 3),       # gap 40 > 30 -> new session
        (1, 55, 4), (2, 0, 5),
    ]
    df = spark.createDataFrame(
        [(k, __import__("datetime").datetime(2024, 1, 1, 0, m), i) for k, m, i in rows],
        "k int, ts timestamp, seq int",
    )
    out = {
        r.seq: r.session_id
        for r in sessionize(df, "k", "ts", gap_minutes=30, tiebreak="seq").collect()
    }
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}


def test_sessionize_exact_gap_boundary(spark):
    """A gap of exactly gap_minutes does NOT split (strictly-greater)."""
    import datetime as _dt

    from evolution_spark.operators.temporal import sessionize

    df = spark.createDataFrame(
        [(1, _dt.datetime(2024, 1, 1, 0, 0), 1), (1, _dt.datetime(2024, 1, 1, 0, 30), 2)],
        "k int, ts timestamp, seq int",
    )
    out = {r.seq: r.session_id for r in sessionize(df, "k", "ts", 30, "seq").collect()}
    assert out == {1: 0, 2: 0}
