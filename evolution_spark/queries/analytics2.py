"""Round-5 analytics battery: data-integrity auditing, anomaly scoring,
user-journey path mining, point-in-time dimension lookup, k-hop graph
reach, robust winsorization, and seasonal decomposition.

These fill the operational gaps a 100 TB ingest pipeline hits between the
relational core and the curation stack: referential orphan auditing (did a
partial load break FK integrity?), per-group z-score outliers (bad-sensor /
fraud triage), sessionized path mining (what do users do first?), the
feature-store staple — "as of this fact's timestamp, what was the entity's
dimension state?" over SCD2 intervals — BFS blast radius over the purchase
graph, percentile clamping for robust features, and trend/seasonal/residual
splits of metric series.

All oracle-backed (the BFS oracle is a bounded recursive CTE). Scale notes
per query; none introduces a new shuffle shape beyond the Pregel frontier
loop — they compose the existing join/window/as-of machinery.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from evolution_spark.operators.temporal import (
    asof_join,
    scd2_from_changelog,
    sessionize,
)
from evolution_spark.queries.base import query, table


# --------------------------------------------------------------------------
# Referential-integrity audit
# --------------------------------------------------------------------------

_FK_RELS = [
    # (label, fact table, fact key, dim table, dim key)
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
]

_ORPHAN_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{label}' AS fk,
       (SELECT COUNT(*) FROM {fact} f
        WHERE NOT EXISTS (SELECT 1 FROM {dim} d WHERE d.{dk} = f.{fk}))
         AS n_orphans,
       (SELECT COUNT(*) FROM {fact}) AS n_rows"""
    for label, fact, fk, dim, dk in _FK_RELS
)


@query(
    "referential_orphans_audit",
    oracle=f"SELECT fk, n_orphans, n_rows FROM ({_ORPHAN_ORACLE}) ORDER BY fk",
)
def referential_orphans_audit(spark, sf_dir):
    """Foreign-key orphan audit across the four core relationships — the
    post-load integrity gate a warehouse runs after every ingest (a
    partial dimension load silently NULLs downstream joins; this surfaces
    it as a count per relationship instead).

    Scale: each relationship is fact LEFT ANTI dim-keys — the dim side is
    reduced to its DISTINCT key column first, so even a billion-row
    dimension ships only its key set through the join (broadcast when
    small, shuffled-hash otherwise — Catalyst picks per AQE stats). The
    fact side is one narrow scan per relationship; counts are map-side
    partial aggregates."""
    out = None
    for label, fact, fk, dim, dk in _FK_RELS:
        f_df = table(spark, sf_dir, fact).select(F.col(fk).alias("__k"))
        d_keys = table(spark, sf_dir, dim).select(F.col(dk).alias("__k")).distinct()
        orphans = f_df.join(d_keys, "__k", "left_anti").agg(
            F.count(F.lit(1)).alias("n_orphans")
        )
        row = (
            orphans.crossJoin(f_df.agg(F.count(F.lit(1)).alias("n_rows")))
            .select(F.lit(label).alias("fk"), "n_orphans", "n_rows")
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fk")


# --------------------------------------------------------------------------
# Per-group z-score outliers
# --------------------------------------------------------------------------


@query(
    "event_value_outliers",
    oracle="""
    WITH s AS (
      SELECT event_type, AVG(value) AS m, STDDEV_SAMP(value) AS sd
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - s.m) / s.sd, 3) AS z
    FROM events e JOIN s USING (event_type)
    ORDER BY ABS(ROUND((e.value - s.m) / s.sd, 3)) DESC, e.event_id
    LIMIT 50
    """,
)
def event_value_outliers(spark, sf_dir):
    """Top-50 events by |z-score| of ``value`` within their event_type —
    the standard per-segment anomaly triage (fraudulent amounts, broken
    sensors) expressed without a window: group stats are one hash
    aggregate (5 rows), broadcast back onto the stream, so the scoring
    pass is narrow and the only ordering work is a TakeOrderedAndProject
    top-50. z is rounded to 3 dp before ranking so cross-engine float-
    summation drift (~1e-12) cannot reorder the cut."""
    e = table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("__m"), F.stddev_samp("value").alias("__sd")
    )
    z = F.round((F.col("value") - F.col("__m")) / F.col("__sd"), 3)
    return (
        e.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .orderBy(F.abs(F.col("z")).desc(), "event_id")
        .limit(50)
    )


# --------------------------------------------------------------------------
# Sessionized path mining
# --------------------------------------------------------------------------


@query(
    "session_path_topk",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id, event_type,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(CASE WHEN gap > 1800000000 THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS session_id
      FROM gaps
    ),
    rn AS (
      SELECT user_id, session_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                                ORDER BY ts, event_id) AS r
      FROM numbered
    ),
    paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY r) AS path
      FROM rn WHERE r <= 3 GROUP BY user_id, session_id
    )
    SELECT path, COUNT(*) AS n_sessions
    FROM paths GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20
    """,
)
def session_path_topk(spark, sf_dir):
    """Top-20 opening paths (first three event types) across 30-minute-gap
    sessions — "what do users do first?" journey mining. Uses the same
    gap-sessionization convention as concurrent_sessions_peak.

    Scale: one shuffle on user_id serves both window passes (gap flags and
    per-session row numbers share the sort); the ≤3 rows kept per session
    collapse into a path string via a size-3 in-memory sort, and the final
    frequency count is a hash aggregate on short strings with a top-20
    TakeOrderedAndProject — no global sort of sessions."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    numbered = sessionize(
        e, key="user_id", ts_col="ts", gap_minutes=30, tiebreak="event_id"
    )
    w2 = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    first3 = numbered.withColumn("r", F.row_number().over(w2)).where(F.col("r") <= 3)
    paths = first3.groupBy("user_id", "session_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("r", "event_type"))),
                lambda x: x["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Point-in-time (PIT) dimension lookup over SCD2
# --------------------------------------------------------------------------


@query(
    "pit_join_scd2_purchases",
    oracle="""
    WITH np AS (
      SELECT user_id, ts, event_id, event_type
      FROM events WHERE event_type <> 'purchase'
    ),
    ordered AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev
      FROM np
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev IS NULL OR prev <> event_type
    ),
    iv AS (
      SELECT user_id, event_type AS status, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM changes
    ),
    p AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           p.value, iv.status AS status_at_purchase
    FROM p LEFT JOIN iv
      ON iv.user_id = p.user_id
     AND iv.valid_from <= p.ts
     AND (iv.valid_to IS NULL OR p.ts < iv.valid_to)
    """,
)
def pit_join_scd2_purchases(spark, sf_dir):
    """Point-in-time lookup: each purchase event joined to the user's
    activity status (their SCD2 regime built from the NON-purchase event
    stream) valid at the purchase timestamp — the feature-store staple
    that prevents label leakage (training features must reflect dimension
    state AS OF the fact, not today's).

    Implementation: SCD2 intervals from scd2_from_changelog, then the
    distributed as-of join (operators/temporal.asof_join) on
    (user_id, ts): for contiguous non-overlapping intervals, "the latest
    valid_from <= ts" IS the containing interval, so no interval-range
    join is needed — one union + one keyed window pass, the same plan
    shape that survives 100x (no per-interval fan-out). Purchases before
    a user's first status regime surface with a NULL status, matching the
    left-join oracle."""
    e = table(spark, sf_dir, "events")
    iv = scd2_from_changelog(
        e.where(F.col("event_type") != "purchase").select(
            "user_id", "ts", "event_id", "event_type"
        ),
        key="user_id",
        order_col="ts",
        attr_cols=["event_type"],
        tiebreak="event_id",
    )
    # drop zero-width intervals (two status changes at the same instant
    # leave a [t, t) regime): the oracle's containment predicate excludes
    # them, and after the filter valid_from is unique per user, so the
    # as-of join's same-instant tie-break can never be exercised — the
    # result stays deterministic and oracle-identical even on data with
    # timestamp collisions
    iv = iv.where(
        F.col("valid_to").isNull() | (F.col("valid_to") > F.col("valid_from"))
    ).select(
        "user_id",
        F.col("valid_from").alias("ts"),
        F.col("event_type").alias("status_at_purchase"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(purchases, iv, on="ts", by="user_id", direction="backward")
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "value",
        "status_at_purchase",
    )


# --------------------------------------------------------------------------
# k-hop BFS reach (blast radius / neighborhood size)
# --------------------------------------------------------------------------


@query(
    "bfs_khop_reach",
    oracle="""
    WITH RECURSIVE cs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT c * 2 AS u, s * 2 + 1 AS v FROM cs
      UNION ALL
      SELECT s * 2 + 1, c * 2 FROM cs
    ),
    reach(node, hop) AS (
        SELECT CAST(2 AS BIGINT), 0
      UNION
        SELECT e.v, r.hop + 1
        FROM reach r JOIN edges e ON e.u = r.node
        WHERE r.hop < 3
    ),
    minhop AS (SELECT node, MIN(hop) AS hop FROM reach GROUP BY node)
    SELECT hop,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
           COUNT(*) AS n_nodes
    FROM minhop GROUP BY hop, kind ORDER BY hop, kind
    """,
)
def bfs_khop_reach(spark, sf_dir):
    """3-hop breadth-first reach from customer 1 over the bipartite
    customer<->supplier purchase graph: how many customers/suppliers are
    first reached at each hop (hop 1 = their suppliers, hop 2 = customers
    sharing a supplier, hop 3 = those customers' other suppliers) — the
    blast-radius / neighborhood-size query behind recall expansion and
    contagion analysis.

    Scale: operators/graph.bfs_khops — each round shuffles only the
    frontier's ids through one edge join (Pregel frontier discipline; the
    visited set never moves). Node ids stay BIGINT through the loop
    (customer k -> 2k, supplier k -> 2k+1, PageRank's encoding); kind
    labels decode only in the final aggregation. The oracle is a bounded
    recursive CTE with min-hop fold."""
    from evolution_spark.operators.graph import bfs_khops

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    cs = l.join(o, l.l_orderkey == o.o_orderkey).select(
        (F.col("o_custkey") * 2).alias("u"),
        (F.col("l_suppkey") * 2 + 1).alias("v"),
    )
    edges = cs.union(cs.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sources = spark.range(1).select((F.lit(2)).cast("long").alias("node"))
    vis = bfs_khops(edges, sources, max_hops=3, src="u", dst="v")
    kind = F.when(F.col("node") % 2 == 0, "customer").otherwise("supplier")
    return (
        vis.groupBy("hop", kind.alias("kind"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("hop", "kind")
    )


# --------------------------------------------------------------------------
# Rank-based winsorization (outlier clamping)
# --------------------------------------------------------------------------


@query(
    "winsorize_event_values",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS r,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    cuts AS (
      SELECT event_type,
             MAX(CASE WHEN r = GREATEST(CAST(CEIL(0.05 * n) AS BIGINT), 1)
                      THEN value END) AS lo,
             MAX(CASE WHEN r = CAST(CEIL(0.95 * n) AS BIGINT)
                      THEN value END) AS hi
      FROM ranked GROUP BY event_type
    )
    SELECT e.event_type,
           ROUND(c.lo, 2) AS lo, ROUND(c.hi, 2) AS hi,
           CAST(SUM(CASE WHEN e.value < c.lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped_low,
           CAST(SUM(CASE WHEN e.value > c.hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped_high,
           ROUND(AVG(e.value), 2) AS mean_before,
           ROUND(AVG(LEAST(GREATEST(e.value, c.lo), c.hi)), 2) AS mean_after
    FROM events e JOIN cuts c USING (event_type)
    GROUP BY e.event_type, c.lo, c.hi ORDER BY e.event_type
    """,
)
def winsorize_event_values(spark, sf_dir):
    """Winsorization (outlier clamping to the 5th/95th percentile) of
    event values per event_type — the standard robust-feature cleaning
    step before training. Cutoffs use the NEAREST-RANK percentile
    definition (the value at row ceil(q*n) of the sorted group) instead
    of interpolation: rank selection is integer-exact, so both engines
    pick the identical raw value and there is NO cross-engine float-
    interpolation drift in the cut itself.

    Scale: one window pass per group for ranks (same shuffle as any
    per-key sort), cutoffs collapse to one row per group and broadcast
    back; the clamp is a narrow LEAST/GREATEST projection. At 100 TB the
    rank pass is the cost of one sort-shuffle of (type, value, id)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    cuts = ranked.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("r")
                == F.greatest(F.ceil(0.05 * F.col("n")).cast("long"), F.lit(1)),
                F.col("value"),
            )
        ).alias("lo"),
        F.max(
            F.when(F.col("r") == F.ceil(0.95 * F.col("n")).cast("long"), F.col("value"))
        ).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        e.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type", F.round("lo", 2).alias("lo"), F.round("hi", 2).alias("hi"))
        .agg(
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0)).alias(
                "n_clamped_low"
            ),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0)).alias(
                "n_clamped_high"
            ),
            F.round(F.avg("value"), 2).alias("mean_before"),
            F.round(F.avg(clamped), 2).alias("mean_after"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Moving-average seasonal decomposition
# --------------------------------------------------------------------------


@query(
    "seasonal_decompose_orders",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS revenue
      FROM orders GROUP BY 1
    ),
    t AS (
      SELECT d, revenue,
             CASE WHEN COUNT(*) OVER w = 7
                  THEN AVG(revenue) OVER w END AS trend
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    s AS (
      SELECT dayofweek(d) AS dow, AVG(revenue - trend) AS seasonal
      FROM t WHERE trend IS NOT NULL GROUP BY 1
    )
    SELECT strftime(t.d, '%Y-%m-%d') AS day, ROUND(t.revenue, 2) AS revenue,
           ROUND(t.trend, 2) AS trend,
           ROUND(s.seasonal, 2) AS seasonal,
           ROUND(t.revenue - t.trend - s.seasonal, 2) AS residual
    FROM t JOIN s ON s.dow = dayofweek(t.d)
    WHERE t.trend IS NOT NULL
    """,
)
def seasonal_decompose_orders(spark, sf_dir):
    """Classical moving-average decomposition of the daily order-revenue
    series: trend = centered 7-day moving average (full windows only),
    seasonal = mean detrended value per day-of-week, residual = the rest —
    the first-pass seasonality/anomaly split for any metric series.

    Scale: the raw scan collapses to ONE row per day in a hash aggregate
    before any window runs, so the global-ordering window operates on the
    domain-sized daily series (thousands of rows per decade) — the same
    post-agg-global-window pattern as equidepth_histogram, never a global
    sort of raw orders. Day-of-week seasonal means broadcast back onto
    the series."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("revenue")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    t = daily.select(
        "d",
        "revenue",
        F.when(F.count(F.lit(1)).over(w) == 7, F.avg("revenue").over(w)).alias(
            "trend"
        ),
    ).where(F.col("trend").isNotNull())
    # Spark dayofweek: 1=Sunday..7=Saturday — same as DuckDB's dayofweek+1;
    # align by computing DuckDB-style (0=Sunday..6=Saturday) explicitly
    dow = F.dayofweek("d") - 1
    s = (
        t.groupBy(dow.alias("dow"))
        .agg(F.avg(F.col("revenue") - F.col("trend")).alias("seasonal"))
    )
    return (
        t.withColumn("dow", dow)
        .join(F.broadcast(s), "dow")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.round("revenue", 2).alias("revenue"),
            F.round("trend", 2).alias("trend"),
            F.round("seasonal", 2).alias("seasonal"),
            F.round(
                F.col("revenue") - F.col("trend") - F.col("seasonal"), 2
            ).alias("residual"),
        )
    )


# --------------------------------------------------------------------------
# CUSUM change-point detection
# --------------------------------------------------------------------------


@query(
    "cusum_changepoint_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS revenue
      FROM orders GROUP BY 1
    ),
    m AS (SELECT AVG(revenue) AS mu FROM daily),
    c AS (
      SELECT d, revenue,
             SUM(revenue - m.mu) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
      FROM daily, m
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, ROUND(revenue, 2) AS revenue,
           ROUND(cusum, 2) AS cusum
    FROM c ORDER BY ABS(ROUND(cusum, 2)) DESC, day LIMIT 5
    """,
)
def cusum_changepoint_revenue(spark, sf_dir):
    """CUSUM change-point scan of daily order revenue: cumulative sum of
    deviations from the series mean; the |CUSUM| peak is the classic
    single-change-point estimate (where the level shift most likely
    happened). Top-5 candidate days.

    Scale: raw orders collapse to one row per day BEFORE any ordering
    (hash aggregate), so the global running sum operates on the
    domain-sized daily series — the same post-agg pattern as
    seasonal_decompose_orders; the mean is a 1-row broadcast. CUSUM adds
    in day order in both engines, so summation order is identical and
    2 dp rounding absorbs the remaining associativity drift."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("revenue")
    )
    mu = daily.agg(F.avg("revenue").alias("mu"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    c = daily.crossJoin(F.broadcast(mu)).select(
        "d",
        "revenue",
        F.sum(F.col("revenue") - F.col("mu")).over(w).alias("cusum"),
    )
    return (
        c.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.round("revenue", 2).alias("revenue"),
            F.round("cusum", 2).alias("cusum"),
        )
        .orderBy(F.abs(F.col("cusum")).desc(), "day")
        .limit(5)
    )


# --------------------------------------------------------------------------
# Two-sample z-test (A/B comparison)
# --------------------------------------------------------------------------


@query(
    "ab_test_event_values",
    oracle="""
    WITH g AS (
      SELECT event_type, COUNT(*) AS n, AVG(value) AS m,
             VAR_SAMP(value) AS v
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY event_type
    ),
    a AS (SELECT * FROM g WHERE event_type = 'click'),
    b AS (SELECT * FROM g WHERE event_type = 'view')
    SELECT CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
           ROUND(a.m, 4) AS mean_a, ROUND(b.m, 4) AS mean_b,
           ROUND(a.m - b.m, 4) AS diff,
           ROUND(SQRT(a.v / a.n + b.v / b.n), 4) AS se,
           ROUND((a.m - b.m) / SQRT(a.v / a.n + b.v / b.n), 4) AS z,
           ABS((a.m - b.m) / SQRT(a.v / a.n + b.v / b.n)) > 1.96
             AS significant
    FROM a, b
    """,
)
def ab_test_event_values(spark, sf_dir):
    """Two-sample z-test comparing mean event value between the 'click'
    and 'view' arms — the A/B readout every experimentation platform
    reduces to: difference of means over the pooled standard error, with
    the |z| > 1.96 (95%) significance verdict.

    Scale: the entire test is TWO aggregate rows (n, mean, variance per
    arm) joined on nothing — one scan with map-side partial aggregates,
    then driver-sized arithmetic. Nothing about this changes at 100 TB
    except the scan."""
    e = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view")
    )
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("v"),
    )
    a = g.where(F.col("event_type") == "click").select(
        F.col("n").alias("n_a"), F.col("m").alias("m_a"), F.col("v").alias("v_a")
    )
    b = g.where(F.col("event_type") == "view").select(
        F.col("n").alias("n_b"), F.col("m").alias("m_b"), F.col("v").alias("v_b")
    )
    se = F.sqrt(F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b"))
    z = (F.col("m_a") - F.col("m_b")) / se
    return a.crossJoin(b).select(
        "n_a",
        "n_b",
        F.round("m_a", 4).alias("mean_a"),
        F.round("m_b", 4).alias("mean_b"),
        F.round(F.col("m_a") - F.col("m_b"), 4).alias("diff"),
        F.round(se, 4).alias("se"),
        F.round(z, 4).alias("z"),
        (F.abs(z) > 1.96).alias("significant"),
    )


# --------------------------------------------------------------------------
# Data-contract assertion battery
# --------------------------------------------------------------------------


@query(
    "data_contract_orders",
    oracle="""
    WITH w AS (
      SELECT
        CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT)
          AS v_custkey_not_null,
        CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1990-01-01'
                       AND o_orderdate < TIMESTAMP '2010-01-01'
                      THEN 0 ELSE 1 END) AS BIGINT) AS v_orderdate_in_range,
        CAST(SUM(CASE WHEN o_orderkey IS NOT NULL AND o_orderkey >= 0
                      THEN 0 ELSE 1 END) AS BIGINT) AS v_orderkey_nonneg,
        CAST(SUM(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
                      THEN 0 ELSE 1 END) AS BIGINT) AS v_status_enum,
        CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT)
          AS v_totalprice_positive,
        COUNT(*) AS n_rows
      FROM orders
    )
    SELECT 'custkey_not_null' AS rule, v_custkey_not_null AS n_violations,
           n_rows FROM w
    UNION ALL SELECT 'orderdate_in_range', v_orderdate_in_range, n_rows FROM w
    UNION ALL SELECT 'orderkey_nonneg', v_orderkey_nonneg, n_rows FROM w
    UNION ALL SELECT 'status_enum', v_status_enum, n_rows FROM w
    UNION ALL SELECT 'totalprice_positive', v_totalprice_positive, n_rows FROM w
    ORDER BY rule
    """,
)
def data_contract_orders(spark, sf_dir):
    """dbt-style contract assertions over orders — non-null keys, enum
    membership, positive amounts, date sanity — evaluated by
    operators/curation.data_contract_check: every rule is a conditional
    count in ONE hash aggregate over ONE scan, so the battery costs one
    pass at 100 TB regardless of rule count."""
    from evolution_spark.operators.curation import data_contract_check

    o = table(spark, sf_dir, "orders")
    rules = [
        ("custkey_not_null", F.col("o_custkey").isNotNull()),
        (
            "orderdate_in_range",
            (F.col("o_orderdate") >= F.lit("1990-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("2010-01-01").cast("timestamp_ntz")),
        ),
        ("orderkey_nonneg", F.col("o_orderkey").isNotNull() & (F.col("o_orderkey") >= 0)),
        ("status_enum", F.col("o_orderstatus").isin("O", "F", "P")),
        ("totalprice_positive", F.col("o_totalprice") > 0),
    ]
    return data_contract_check(o, rules)


# --------------------------------------------------------------------------
# Theil-Sen robust trend
# --------------------------------------------------------------------------


@query(
    "theil_sen_trend_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS y
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT ROW_NUMBER() OVER (ORDER BY d) - 1 AS x, y FROM daily
    ),
    slopes AS (
      SELECT (b.y - a.y) / (b.x - a.x) AS s
      FROM idx a JOIN idx b ON b.x > a.x AND b.x - a.x <= 30
    )
    SELECT ROUND(quantile_cont(s, 0.5), 4) AS slope,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM slopes
    """,
)
def theil_sen_trend_revenue(spark, sf_dir):
    """Theil-Sen robust trend of daily order revenue: the median of
    pairwise slopes — insensitive to the outlier days that wreck
    least-squares (the robust twin of linear_trend_by_type). Pairs are
    WINDOW-LIMITED to lags <= 30 days: the estimator stays consistent,
    pair count is O(days x 30) instead of O(days^2) — the standard
    banded Theil-Sen that survives series of any length.

    Scale: raw orders collapse to the domain-sized daily series first; the
    banded self-join fans each day to <= 30 pairs (range-join on the day
    index); the median is the same exact interpolated percentile the
    percentile_exact query proved bit-identical cross-engine. 4 dp
    rounding absorbs division associativity."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("y")
    )
    idx = daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1).alias("x"), "y"
    )
    # EQUI-key banding: xb - xa <= 30 implies xb's 30-bucket is xa's or the
    # next one, so the left side fans to exactly 2 join keys and the join
    # is a hash join on the bucket — a bare non-equi condition would plan
    # as a nested-loop doing O(days^2) comparisons, which is what the
    # banding exists to avoid
    a = idx.select(
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(
            F.array(
                F.floor(F.col("x") / 30), F.floor(F.col("x") / 30) + 1
            )
        ).alias("bkt"),
    )
    b = idx.select(
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.floor(F.col("x") / 30).alias("bkt"),
    )
    slopes = (
        a.join(b, "bkt")
        .where((F.col("xb") > F.col("xa")) & (F.col("xb") - F.col("xa") <= 30))
        .select(((F.col("yb") - F.col("ya")) / (F.col("xb") - F.col("xa"))).alias("s"))
    )
    return slopes.agg(
        F.round(F.percentile("s", F.lit(0.5)), 4).alias("slope"),
        F.count(F.lit(1)).alias("n_pairs"),
    )


# --------------------------------------------------------------------------
# Benford first-digit forensics
# --------------------------------------------------------------------------


@query(
    "benford_digit_test",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS INT) AS d
      FROM orders WHERE o_totalprice >= 1
    ),
    spine AS (SELECT CAST(UNNEST(range(1, 10)) AS INT) AS d),
    counts AS (
      SELECT s.d, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
      FROM spine s LEFT JOIN (SELECT d, COUNT(*) AS n FROM digits GROUP BY d) c
        ON c.d = s.d
    ),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM counts)
    SELECT d, n,
           ROUND(n / t, 4) AS observed,
           ROUND(LOG10(1.0 + 1.0 / d), 4) AS expected,
           ROUND(POW(n / t - LOG10(1.0 + 1.0 / d), 2)
                 / LOG10(1.0 + 1.0 / d) * t, 2) AS chi2_term
    FROM counts, tot ORDER BY d
    """,
)
def benford_digit_test(spark, sf_dir):
    """Benford's-law first-digit test of order amounts — the classic
    fraud/fabrication forensic: natural multi-scale amounts follow
    P(d) = log10(1 + 1/d); per-digit observed share, expected share, and
    the chi-square contribution (sum them for the test statistic).

    Scale: ONE scan -> 9-row hash aggregate; the total is a 1-row
    broadcast. A 9-row digit spine left-joins the counts so a digit that
    NEVER occurs still contributes its (0 - t*p_d)^2 / (t*p_d) = t*p_d
    chi-square term — dropping absent groups would understate the
    statistic exactly when the data is most anomalous. Note the driver's
    synthetic prices are ~uniform, so this corpus FAILS Benford (huge
    chi2) — which is itself the point: the test flags non-natural amount
    distributions, and the oracle pins the arithmetic either way."""
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    # explicit FLOOR on both sides: Spark's double->bigint cast truncates
    # while DuckDB's ROUNDS, so a price at a .9997 boundary would flip its
    # first digit between engines
    d = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("d"))
    observed = o.select(d.alias("d")).groupBy("d").agg(
        F.count(F.lit(1)).alias("n")
    )
    counts = (
        spine.join(observed, "d", "left")
        .select("d", F.coalesce("n", F.lit(0)).alias("n"))
    )
    tot = counts.agg(F.sum("n").cast("double").alias("t"))
    expected = F.log10(1.0 + 1.0 / F.col("d"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "d",
            "n",
            F.round(F.col("n") / F.col("t"), 4).alias("observed"),
            F.round(expected, 4).alias("expected"),
            F.round(
                F.pow(F.col("n") / F.col("t") - expected, 2)
                / expected
                * F.col("t"),
                2,
            ).alias("chi2_term"),
        )
        .orderBy("d")
    )


# --------------------------------------------------------------------------
# Lagged cross-correlation of two daily series
# --------------------------------------------------------------------------


@query(
    "lagged_crosscorr_orders",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(o_totalprice) AS revenue,
             CAST(COUNT(*) AS DOUBLE) AS n_orders
      FROM orders GROUP BY 1
    ),
    lags AS (SELECT CAST(UNNEST(range(4)) AS INT) AS lag),
    pairs AS (
      SELECT l.lag, a.revenue AS x, b.n_orders AS y
      FROM daily a CROSS JOIN lags l
      JOIN daily b ON b.d = a.d - l.lag * INTERVAL 1 DAY
    )
    SELECT lag, ROUND(CORR(x, y), 4) AS corr,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM pairs GROUP BY lag ORDER BY lag
    """,
)
def lagged_crosscorr_orders(spark, sf_dir):
    """Cross-correlation function of daily revenue against daily order
    count at lags 0..3 — "does volume lead value?" — the lead-lag readout
    behind demand forecasting features.

    Lags are CALENDAR-exact: y at lag k is the order count of the day
    exactly k days earlier (a date_sub equi-join), so gaps in the daily
    series drop the pair instead of silently correlating against the
    previous OBSERVED day at an irregular true lag.

    Scale: orders collapse to the domain-sized daily series; the lag
    pairing is one equi-join of that series against itself on shifted
    dates (4 keys per row) plus one corr aggregate per lag — all
    post-agg, never a window over raw orders. Pearson corr is rounded to
    4 dp (cross-engine summation drift on the covariance accumulators is
    ~1e-12 relative)."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("revenue"),
        F.count(F.lit(1)).cast("double").alias("n_orders"),
    )
    lags = spark.range(4).select(F.col("id").cast("int").alias("lag"))
    a = daily.crossJoin(F.broadcast(lags)).select(
        "lag",
        F.col("revenue").alias("x"),
        F.date_sub("d", F.col("lag")).alias("d_prev"),
    )
    b = daily.select(F.col("d").alias("d_prev"), F.col("n_orders").alias("y"))
    return (
        a.join(b, "d_prev")
        .groupBy("lag")
        .agg(
            F.round(F.corr("x", "y"), 4).alias("corr"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .orderBy("lag")
    )
