"""Date/time functions and time-window analytics over the ``events`` table.

Batch-mode equivalents of the streaming surface (tumbling/sliding/session
windows, dedup) — the same logic runs incrementally in
``evolution_spark.streaming``. Timestamps are rendered as strings in outputs
(engine-neutral for the DuckDB oracle hash).

Scale notes: every window here shuffles once on its partition key; session
windows use the gaps-and-islands pattern (lag + cumulative sum) which is the
scalable batch formulation (no per-session state object, just two window
functions over one shuffle by user).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from evolution_spark.functions.time import micros_since_epoch
from evolution_spark.queries.base import query, table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@query(
    "date_extract_parts",
    oracle="""
    SELECT CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
           CAST(dayofmonth(ts) AS INT) AS d, CAST(hour(ts) AS INT) AS h,
           COUNT(*) AS n_events,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS sum_value
    FROM events GROUP BY 1, 2, 3, 4
    """,
)
def date_extract_parts(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return e.groupBy(
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0).alias("sum_value"),
    )


@query(
    "date_trunc_daily",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type, COUNT(*) AS n,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) * 1.0 / COUNT(*) / 100.0 AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def date_trunc_daily(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.round(F.col("value") * 100).cast("bigint")) * 1.0
         / F.count(F.lit(1)) / 100.0).alias("avg_value"),
    )


@query(
    "date_diff_arithmetic",
    oracle="""
    SELECT o.o_orderkey AS orderkey, l.l_linenumber AS linenumber,
           datediff('day', o.o_orderdate, l.l_shipdate) AS ship_delay_days,
           strftime(o.o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           CAST(dayofweek(o.o_orderdate) + 1 AS INT) AS order_dow
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_linenumber = 1
    """,
)
def date_diff_arithmetic(spark, sf_dir):
    """datediff / interval arithmetic / day-of-week. Spark datediff(end,start)
    == DuckDB datediff('day', start, end); Spark dayofweek is 1=Sunday while
    DuckDB's is 0=Sunday, so the oracle adds 1."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") == 1)
    return o.join(l, o.o_orderkey == l.l_orderkey).select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.datediff("l_shipdate", "o_orderdate").alias("ship_delay_days"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("due_date"),
        F.dayofweek("o_orderdate").alias("order_dow"),
    )


@query(
    "tumbling_window_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS n,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def tumbling_window_hourly(spark, sf_dir):
    """Tumbling 1-hour window via F.window — the batch twin of the
    Structured Streaming tumbling aggregation (streaming/events.py)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             (F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0).alias("sum_value"))
        .select(
            F.date_format(F.col("window.start"), _TS_FMT).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "sliding_window_30min",
    oracle="""
    WITH buckets AS (
      SELECT to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800
                          - offs * 1800)::TIMESTAMP AS window_start, value
      FROM events CROSS JOIN (SELECT unnest([0, 1]) AS offs)
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS sum_value
    FROM buckets GROUP BY 1
    """,
)
def sliding_window_30min(spark, sf_dir):
    """Sliding window (1 h length, 30 min slide): each event lands in 2
    windows. F.window handles assignment natively; the oracle replicates via
    the two shifted half-hour buckets."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"),
             (F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0).alias("sum_value"))
        .select(
            F.date_format(F.col("window.start"), _TS_FMT).alias("window_start"),
            "n",
            "sum_value",
        )
    )


@query(
    "session_window_gaps",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, value
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM marked
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS sum_value,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start
    FROM sessions GROUP BY user_id, session_id
    """,
)
def session_window_gaps(spark, sf_dir):
    """Sessionization (30-min inactivity gap) via gaps-and-islands: lag to
    mark session starts, running sum to number sessions. Two window functions
    over ONE shuffle by user_id — the scalable batch sessionizer. The
    streaming twin uses session_window() (streaming/events.py)."""
    e = table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = Window.partitionBy("user_id").orderBy("ts", "value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # micros_since_epoch: microsecond-exact, NTZ-safe gap comparison (a
    # seconds cast would disagree with the oracle's INTERVAL comparison)
    us = micros_since_epoch(e, "ts")
    marked = e.withColumn(
        "new_session",
        F.when(
            us - F.lag(us).over(w_order) > 30 * 60 * 1_000_000,
            1,
        ).otherwise(0),
    )
    sessions = marked.withColumn("session_id", F.sum("new_session").over(w_run))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0).alias("sum_value"),
        F.date_format(F.min("ts"), _TS_FMT).alias("session_start"),
    )


@query(
    "event_dedup_exact",
    oracle="""
    SELECT user_id, event_type, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2, 3
    """,
)
def event_dedup_exact(spark, sf_dir):
    """Duplicate detection on (user, type, second-truncated ts) — the batch
    twin of dropDuplicatesWithinWatermark."""
    e = table(spark, sf_dir, "events")
    return e.groupBy(
        "user_id",
        "event_type",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "json_props_extract",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k_value
    FROM events
    """,
)
def json_props_extract(spark, sf_dir):
    """JSON extraction from the props column (semi-structured support)."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
    )


@query(
    "variant_props_analytics",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
             AS sum_k,
           CAST(COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS INT))
                AS BIGINT) AS distinct_k,
           MIN(CAST(json_extract_string(props, '$.missing') AS INT)) AS always_null
    FROM events GROUP BY event_type
    """,
)
def variant_props_analytics(spark, sf_dir):
    """Semi-structured analytics on Spark 4's VARIANT type: ``parse_json``
    once into a variant column (the columnar-shredded open format — at
    100 TB this is the difference between re-parsing JSON text per
    expression and reading typed shredded subcolumns), then typed
    ``variant_get`` extractions feed a per-type aggregate;
    ``try_variant_get`` on an absent path proves the null-safe accessor.
    Oracle: DuckDB's JSON extraction over the same props strings."""
    e = table(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.parse_json("props").alias("p")
    ).select(
        "event_type",
        F.expr("variant_get(p, '$.k', 'int')").alias("k"),
        F.expr("try_variant_get(p, '$.missing', 'int')").alias("m"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.countDistinct("k").alias("distinct_k"),
        F.min("m").alias("always_null"),
    )


@query(
    "attribution_click_purchase",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           p.value AS purchase_value
    FROM events c
      JOIN events p
        ON p.user_id = c.user_id
       AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def attribution_click_purchase(spark, sf_dir):
    """Click→purchase attribution: batch twin of the stream-stream interval
    join (streaming/events.click_purchase_join — the SAME function body runs
    here; withWatermark is a no-op in batch). Each click matches the user's
    purchases within 30 minutes after it. In batch this is an equi-join on
    user_id with a range residual — one shuffle of each side; streaming keeps
    only a watermark-bounded window of both sides in state."""
    from evolution_spark.streaming.events import click_purchase_join

    e = table(spark, sf_dir, "events")
    joined = click_purchase_join(e, max_gap="30 minutes", watermark="1 hour")
    return joined.select(
        "click_id",
        "purchase_id",
        "user_id",
        F.date_format("click_ts", _TS_FMT).alias("click_ts"),
        F.date_format("purchase_ts", _TS_FMT).alias("purchase_ts"),
        "purchase_value",
    )


@query(
    "changelog_compaction",
    oracle="""
    SELECT user_id,
           arg_max(event_type, printf('%020d|%012d', epoch_us(ts), event_id)) AS last_type,
           arg_max(value, printf('%020d|%012d', epoch_us(ts), event_id)) AS last_value,
           bool_and(value >= 0) AS all_nonneg,
           bool_or(event_type = 'purchase') AS any_purchase,
           count(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def changelog_compaction(spark, sf_dir):
    """Latest-state extraction (changelog compaction): one ``max_by`` pass
    per key instead of the window row_number + filter formulation — single
    shuffle with map-side combine, no per-partition sort, O(1) state per
    key. The ordering key is a zero-padded (epoch_us, event_id) string so
    ties are impossible and both engines pick the same row. bool_and /
    bool_or cover the predicate-aggregate surface.

    At 100 TB this is the CDC-merge primitive: compacting an append-only
    event log to current state without sorting the log."""
    e = table(spark, sf_dir, "events")
    key = F.format_string("%020d|%012d", micros_since_epoch(e, "ts"), F.col("event_id"))
    return e.groupBy("user_id").agg(
        F.max_by("event_type", key).alias("last_type"),
        F.max_by("value", key).alias("last_value"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("event_type") == "purchase").alias("any_purchase"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    ), per_session AS (
      SELECT user_id, session_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM sessions GROUP BY user_id, session_id
    ), flags AS (
      SELECT COUNT(*) AS n_sessions,
             CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                           THEN 1 ELSE 0 END) AS BIGINT) AS s2,
             CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                            AND t_purchase > t_click
                           THEN 1 ELSE 0 END) AS BIGINT) AS s3
      FROM per_session
    )
    SELECT 'all_sessions' AS stage, n_sessions AS n FROM flags
    UNION ALL SELECT 'view', s1 FROM flags
    UNION ALL SELECT 'view>click', s2 FROM flags
    UNION ALL SELECT 'view>click>purchase', s3 FROM flags
    """,
)
def funnel_conversion(spark, sf_dir):
    """Session funnel view -> click -> purchase: a session reaches stage k
    when the FIRST occurrence of each stage's event strictly follows the
    previous stage's first occurrence (the standard first-touch funnel;
    strict > keeps simultaneous events from double-counting and matches the
    oracle's NULL-propagating comparison).

    Plan: the gaps-and-islands sessionizer (one shuffle on user_id, two
    windows over one sort) -> one hash-agg per session -> a scalar
    aggregate broadcast into 4 output rows. Nothing in the plan grows with
    history except the per-session agg."""
    e = table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Both windows order by (ts, event_id) — a total order per user — so the
    # running sum is tie-independent and matches the oracle bit-for-bit even
    # with duplicate (user_id, ts, event_type) rows.
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    us = micros_since_epoch(e, "ts")
    marked = e.withColumn(
        "new_session",
        F.when(
            us - F.lag(us).over(w_order) > 30 * 60 * 1_000_000,
            1,
        ).otherwise(0),
    )
    sessions = marked.withColumn("session_id", F.sum("new_session").over(w_run))

    def first_of(t):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    per_session = sessions.groupBy("user_id", "session_id").agg(
        first_of("view").alias("t_view"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    reach1 = F.col("t_view").isNotNull()
    reach2 = reach1 & (F.col("t_click") > F.col("t_view"))
    reach3 = reach2 & (F.col("t_purchase") > F.col("t_click"))
    flags = per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(reach1.cast("int")).cast("bigint").alias("s1"),
        F.sum(reach2.cast("int")).cast("bigint").alias("s2"),
        F.sum(reach3.cast("int")).cast("bigint").alias("s3"),
    )
    return flags.selectExpr(
        "stack(4, 'all_sessions', n_sessions, 'view', s1, "
        "'view>click', s2, 'view>click>purchase', s3) AS (stage, n)"
    )


@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day FROM events
      GROUP BY user_id
    )
    SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
           date_diff('day', f.cohort_day, date_trunc('day', e.ts)) AS day_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN firsts f USING (user_id)
    GROUP BY f.cohort_day, day_offset
    """,
)
def cohort_retention(spark, sf_dir):
    """Cohort retention triangle: users grouped by first-seen day, counted
    distinct on each subsequent active day offset. Two shuffles (first-seen
    per user, then the cohort/offset count-distinct); the firsts side is
    user-keyed and joins back on user_id — broadcastable when the user
    dimension is small, sort-merge otherwise (no forced hint)."""
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("cohort_day")
    )
    j = e.join(firsts, "user_id")
    return j.groupBy(
        "cohort_day",
        F.datediff(F.date_trunc("day", "ts"), F.col("cohort_day")).alias("day_offset"),
    ).agg(F.count_distinct("user_id").alias("active_users")).select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        "day_offset",
        "active_users",
    )


@query(
    "attribution_unmatched_clicks",
    oracle="""
    WITH unmatched AS (
      SELECT c.event_id, c.ts
      FROM events c
      LEFT JOIN events p
        ON p.user_id = c.user_id
       AND p.event_type = 'purchase'
       AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      WHERE c.event_type = 'click' AND p.event_id IS NULL
    )
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           COUNT(*) AS n_unmatched
    FROM unmatched GROUP BY 1 ORDER BY day
    """,
)
def attribution_unmatched_clicks(spark, sf_dir):
    """Funnel-leak readout: clicks with NO purchase in the 30 minutes after
    them, counted per day — the batch twin of the streaming left-outer
    attribution join (streaming/events.click_purchase_join with
    how='left_outer'; the SAME function body runs here, watermarks are
    batch no-ops, and the stream's null-emission rows are exactly these).

    Scale: one user_id equi-join with a range residual (same shuffle as
    the inner attribution), then a per-day hash aggregate."""
    from evolution_spark.streaming.events import click_purchase_join

    e = table(spark, sf_dir, "events")
    joined = click_purchase_join(
        e, max_gap="30 minutes", watermark="1 hour", how="left_outer"
    )
    return (
        joined.where(F.col("purchase_id").isNull())
        .groupBy(F.date_format("click_ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_unmatched"))
        .orderBy("day")
    )
