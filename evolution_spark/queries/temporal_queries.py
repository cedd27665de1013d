"""As-of and range joins surfaced as oracle-checked queries — DuckDB has
native ``ASOF JOIN``, giving the composed Spark implementation
(operators/temporal.py) an independent reference semantics to match."""

from __future__ import annotations

from pyspark.sql import functions as F

from evolution_spark.operators.temporal import asof_join, range_join
from evolution_spark.queries.base import query, table


@query(
    "asof_join_orders",
    oracle="""
    SELECT e.event_id, e.user_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
           o.o_orderkey AS orderkey
    FROM (SELECT event_id, user_id, ts FROM events) e
    ASOF LEFT JOIN (SELECT o_custkey, MAX(o_orderkey) AS o_orderkey,
                           o_orderdate + INTERVAL 10220 DAY AS odate
                    FROM orders GROUP BY o_custkey, odate) o
      ON e.user_id = o.o_custkey AND e.ts >= o.odate
    """,
)
def asof_join_orders(spark, sf_dir):
    """For each event, the most recent prior order of the same user
    (orders dates shifted into the events epoch so matches exist).

    BOTH sides pre-aggregate orders to one row per (custkey, date) with the
    max orderkey: with same-day duplicate orders (which appear from sf0.1
    up), an as-of match against raw rows is engine-arbitrary — DuckDB's
    ASOF picks an unspecified row among equal timestamps."""
    e = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey"),
        F.col("o_orderkey"),
        (F.col("o_orderdate") + F.expr("INTERVAL 10220 DAYS")).alias("odate"),
    )
    # pre-dedupe right side to one row per (custkey, odate) so the as-of
    # match is unique in BOTH engines (max orderkey wins deterministically)
    o1 = o.groupBy("o_custkey", "odate").agg(F.max("o_orderkey").alias("o_orderkey"))
    joined = asof_join(
        e.withColumnRenamed("ts", "t"),
        o1.select(F.col("o_custkey").alias("user_id"), F.col("odate").alias("t"), "o_orderkey"),
        on="t",
        by="user_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("t", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
        F.col("o_orderkey").alias("orderkey"),
    )


@query(
    "range_join_sessions",
    oracle="""
    WITH windows AS (
      SELECT o_orderkey AS win_id,
             o_orderdate + INTERVAL 10220 DAY AS win_start,
             o_orderdate + INTERVAL 10221 DAY AS win_end
      FROM orders WHERE o_orderkey % 50 = 0
    )
    SELECT w.win_id, COUNT(e.event_id) AS n_events,
           SUM(CAST(ROUND(e.value * 100) AS BIGINT)) / 100.0 AS sum_value
    FROM windows w JOIN events e
      ON e.ts >= w.win_start AND e.ts < w.win_end
    GROUP BY w.win_id
    """,
)
def range_join_sessions(spark, sf_dir):
    """Events falling inside 1-day order windows (point-in-interval range
    join via the binned equi-join operator)."""
    e = table(spark, sf_dir, "events")
    w = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 50 == 0)
        .select(
            F.col("o_orderkey").alias("win_id"),
            (F.col("o_orderdate") + F.expr("INTERVAL 10220 DAYS")).alias("win_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 10221 DAYS")).alias("win_end"),
        )
    )
    joined = range_join(e, w, "ts", "win_start", "win_end", bin_width_seconds=86400)
    return joined.groupBy("win_id").agg(
        F.count("event_id").alias("n_events"),
        (F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0).alias("sum_value"),
    )


@query(
    "asof_join_tolerance",
    oracle="""
    SELECT e.event_id, e.user_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
           CASE WHEN o.odate >= e.ts - INTERVAL 7 DAY THEN o.o_orderkey END
             AS orderkey
    FROM (SELECT event_id, user_id, ts FROM events) e
    ASOF LEFT JOIN (SELECT o_custkey, MAX(o_orderkey) AS o_orderkey,
                           o_orderdate + INTERVAL 10220 DAY AS odate
                    FROM orders GROUP BY o_custkey, odate) o
      ON e.user_id = o.o_custkey AND e.ts >= o.odate
    """,
)
def asof_join_tolerance(spark, sf_dir):
    """asof_join_orders with a 7-day tolerance: a prior order further than
    7 days before the event is no match (pandas merge_asof(tolerance=...)
    semantics). Oracle: DuckDB native ASOF picks the nearest prior row,
    then the CASE nulls matches outside the window — identical semantics
    because nulling the NEAREST match implies no admissible match exists."""
    e = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey"),
        F.col("o_orderkey"),
        (F.col("o_orderdate") + F.expr("INTERVAL 10220 DAYS")).alias("odate"),
    )
    o1 = o.groupBy("o_custkey", "odate").agg(F.max("o_orderkey").alias("o_orderkey"))
    joined = asof_join(
        e.withColumnRenamed("ts", "t"),
        o1.select(F.col("o_custkey").alias("user_id"), F.col("odate").alias("t"), "o_orderkey"),
        on="t",
        by="user_id",
        tolerance=7 * 86400,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("t", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
        F.col("o_orderkey").alias("orderkey"),
    )
