"""Advanced analytics: graph ranking, Pareto frontiers, closed-form
time-series smoothing, Markov transition mining, inverted-index builds,
weighted sampling, and linear-interpolation gap fill.

Everything here is oracle-backed (DuckDB SQL on the same parquet) and built
from shuffle-lean DataFrame plans: the iterative pieces (PageRank) shuffle
only (id, rank) pairs per round; the sequence pieces (EWMA) use a
closed-form window sum instead of a sequential recurrence; the global-order
pieces (skyline) use range partitioning with O(#partitions) boundary
carries, never a single-task global window.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from evolution_spark.operators.curation import weighted_sample
from evolution_spark.operators.graph import pagerank
from evolution_spark.operators.pareto import skyline_2d
from evolution_spark.queries.base import query, table


# --------------------------------------------------------------------------
# PageRank over the order graph
# --------------------------------------------------------------------------

_PR_ITER = """
    c{i} AS (
      SELECT e.dst AS id, SUM(r.rank / g.d) AS c
      FROM edges e
      JOIN r{p} r ON r.id = e.src
      JOIN deg g ON g.src = e.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT n.id, 0.15 + 0.85 * COALESCE(c{i}.c, 0) AS rank
      FROM nodes n LEFT JOIN c{i} ON c{i}.id = n.id
    )"""

_PAGERANK_SQL = (
    """
    WITH e0 AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    r0 AS (SELECT id, 1.0 AS rank FROM nodes),"""
    + ",".join(_PR_ITER.format(i=i, p=i - 1) for i in (1, 2, 3))
    + """
    SELECT id, ROUND(rank, 6) AS pagerank FROM r3
    ORDER BY pagerank DESC, id LIMIT 20
    """
)


@query("pagerank_order_graph", oracle=_PAGERANK_SQL)
def pagerank_order_graph(spark, sf_dir):
    """PageRank (3 fixed iterations, d=0.85, un-normalized GraphX-style
    convention) over the undirected bipartite customer<->supplier graph
    induced by orders x lineitem — "which suppliers sit at the center of the
    purchase network". Top 20 nodes by rank.

    Scale: each iteration is a single (id, rank) join + sum-by-dst shuffle
    (see operators/graph.py:pagerank). Node ids stay BIGINT through the
    whole loop (customer k -> 2k, supplier k -> 2k+1 — integer hashing and
    exchanges, no string keys on the hot path); the 'c'/'s' display labels
    are decoded only for the final 20 rows' projection. Ranks are rounded
    to 6 dp before the final top-k so cross-engine float summation order
    cannot flip the ordering."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = l.join(o, l.l_orderkey == o.o_orderkey).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    ranks = pagerank(edges, iters=3, damping=0.85, symmetric=True)
    label = F.when(
        F.col("id") % 2 == 0,
        F.concat(F.lit("c"), (F.col("id") / 2).cast("bigint").cast("string")),
    ).otherwise(
        F.concat(F.lit("s"), ((F.col("id") - 1) / 2).cast("bigint").cast("string"))
    )
    return (
        ranks.select(label.alias("id"), F.round("rank", 6).alias("pagerank"))
        .orderBy(F.desc("pagerank"), "id")
        .limit(20)
    )


# --------------------------------------------------------------------------
# 2-D skyline / Pareto frontier
# --------------------------------------------------------------------------


@query(
    "skyline_pareto_parts",
    oracle="""
    WITH pts AS (
      SELECT p_partkey, ROUND(p_retailprice, 2) AS price, p_size AS size
      FROM part
    )
    SELECT p_partkey, price, size FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts o
      WHERE o.price <= p.price AND o.size >= p.size
        AND (o.price < p.price OR o.size > p.size)
    )
    """,
)
def skyline_pareto_parts(spark, sf_dir):
    """Pareto-optimal parts: cheapest-for-their-size frontier (minimize
    price, maximize size). The oracle is the quadratic NOT EXISTS dominance
    test; the engine runs the distributed sort-scan skyline
    (operators/pareto.py): one narrow (price, size) range shuffle +
    running-max with per-partition boundary carries — O(n log n) and no
    single-task global window, so it survives a 100x scale-up where the
    self-join oracle would not."""
    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.round("p_retailprice", 2).alias("price"),
        F.col("p_size").alias("size"),
    )
    return skyline_2d(p, "price", "size")


# --------------------------------------------------------------------------
# Closed-form EWMA
# --------------------------------------------------------------------------


@query(
    "ewma_customer_orders",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_custkey) AS n
      FROM orders
    )
    SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
           ROUND(SUM(CASE WHEN rn = 1 THEN o_totalprice * POW(0.7, n - 1)
                          ELSE 0.3 * o_totalprice * POW(0.7, n - rn) END),
                 2) AS ewma_price
    FROM seq GROUP BY o_custkey HAVING COUNT(*) >= 3
    """,
)
def ewma_customer_orders(spark, sf_dir):
    """Exponentially-weighted moving average of each customer's order value
    (alpha=0.3, s_1 = x_1), reported at their latest order. The recurrence
    s_t = a*x_t + (1-a)*s_{t-1} unrolls to the closed form
    s_n = (1-a)^(n-1)*x_1 + a * sum_t x_t (1-a)^(n-t) — one weighted sum per
    key, so the engine computes it with a row_number window + one hash
    aggregation instead of a sequential scan: O(1) per row, shuffle only on
    the customer key, embarrassingly parallel across keys."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wc = Window.partitionBy("o_custkey")
    seq = o.select(
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    term = F.when(
        F.col("rn") == 1,
        F.col("o_totalprice") * F.pow(F.lit(0.7), F.col("n") - 1),
    ).otherwise(
        F.lit(0.3) * F.col("o_totalprice") * F.pow(F.lit(0.7), F.col("n") - F.col("rn"))
    )
    return (
        seq.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # 2 dp, not 4: the weighted-sum terms are irrational products
            # whose cross-engine summation-order drift (~1e-10 abs) lands
            # exactly on 4th-decimal round-half boundaries a few times per
            # 15k keys at sf0.1 — the cent-level boundary is 100x wider
            # than the noise
            F.round(F.sum(term), 2).alias("ewma_price"),
        )
        .where(F.col("n_orders") >= 3)
    )


# --------------------------------------------------------------------------
# Markov transition matrix over event sequences
# --------------------------------------------------------------------------


@query(
    "markov_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    counts AS (
      SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n_transitions
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (SELECT from_type, SUM(n_transitions) AS t FROM counts GROUP BY 1)
    SELECT c.from_type, c.to_type, c.n_transitions,
           ROUND(c.n_transitions / t.t, 6) AS prob
    FROM counts c JOIN tot t USING (from_type)
    """,
)
def markov_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix of user event sequences: for
    every (from_type -> to_type) pair, the transition count and conditional
    probability. The behavioral-model building block behind session
    simulation and next-event prediction.

    Scale: one window shuffle on user_id (sequences stay within their key
    partition), then two tiny aggregations over the type-pair domain
    (|types|^2 rows); the per-from totals broadcast back. No per-user
    collect, no driver loop."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    tot = counts.groupBy("from_type").agg(F.sum("n_transitions").alias("t"))
    return counts.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(F.col("n_transitions") / F.col("t"), 6).alias("prob"),
    )


# --------------------------------------------------------------------------
# Inverted index (capped postings)
# --------------------------------------------------------------------------


@query(
    "inverted_index_postings",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    filtered AS (SELECT * FROM toks WHERE term <> ''),
    stats AS (SELECT term, COUNT(*) AS df FROM filtered GROUP BY term)
    SELECT s.term, s.df,
           array_to_string(
             list_slice(list(CAST(f.doc_id AS VARCHAR) ORDER BY f.doc_id), 1, 50),
             ',') AS postings
    FROM stats s JOIN filtered f USING (term)
    GROUP BY s.term, s.df
    ORDER BY s.df DESC, s.term LIMIT 20
    """,
)
def inverted_index_postings(spark, sf_dir):
    """Build an inverted index: term -> document frequency + the first 50
    doc ids of its posting list (sorted, comma-joined for engine-neutral
    comparison), top 20 terms by df. The retrieval-side complement of the
    BM25/TF-IDF rankers.

    Scale: df is a pure hash aggregation; the posting-list build caps each
    list at 50 ids BEFORE collecting (window row_number <= 50 per term), so
    no aggregation buffer ever holds an O(corpus) list — the classic
    bounded-postings shard layout. Uncapped lists would OOM on a stop-word
    at 100 TB; the cap keeps state O(k) per term."""
    d = table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .distinct()
    )
    stats = toks.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("term").orderBy("doc_id")
    capped = toks.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 50)
    postings = capped.groupBy("term").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")
            ),
            ",",
        ).alias("postings")
    )
    return (
        stats.join(postings, "term")
        .select("term", "df", "postings")
        .orderBy(F.desc("df"), "term")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Weighted sampling (A-ES)
# --------------------------------------------------------------------------


@query(
    "weighted_sample_docs",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             POW((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
                   / 4294967296.0,
                 1.0 / n_chars) AS pr
      FROM documents
    )
    SELECT doc_id, n_chars FROM keyed
    ORDER BY pr DESC, doc_id LIMIT 20
    """,
)
def weighted_sample_docs(spark, sf_dir):
    """Deterministic weighted sample of 20 documents with probability
    proportional to length (Efraimidis-Spirakis A-ES: priority u^(1/w),
    u = md5-derived uniform — bit-identical in Spark and DuckDB). The
    quality-weighted curation draw, reproducible across runs and engines.

    Scale: TakeOrderedAndProject top-k — per-task k-heaps, no global sort
    (see operators/curation.py:weighted_sample)."""
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample(d, key="doc_id", weight="n_chars", k=20)


# --------------------------------------------------------------------------
# Linear-interpolation gap fill (hourly)
# --------------------------------------------------------------------------


@query(
    "interpolate_gapfill_hourly",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(ROUND(AVG(value) * 10000) AS BIGINT) AS vi
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(hour) AS lo, MAX(hour) AS hi FROM hourly GROUP BY 1
    ),
    spine AS (
      SELECT event_type,
             UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
      FROM bounds
    ),
    joined AS (
      SELECT s.event_type, s.hour, h.vi FROM spine s
      LEFT JOIN hourly h ON h.event_type = s.event_type AND h.hour = s.hour
    ),
    ctx AS (
      SELECT event_type, hour, vi,
             last_value(vi IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN vi IS NOT NULL THEN hour END IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
             first_value(vi IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN vi IS NOT NULL THEN hour END IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      FROM joined
    )
    SELECT event_type, strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
           (vi IS NULL) AS interpolated,
           CASE
             WHEN vi IS NOT NULL THEN vi / 10000.0
             WHEN pv IS NULL THEN nv / 10000.0
             WHEN nv IS NULL THEN pv / 10000.0
             ELSE CAST(pv * date_diff('hour', hour, nh)
                       + nv * date_diff('hour', ph, hour) AS DOUBLE)
                  / (date_diff('hour', ph, nh) * 10000.0)
           END AS value_filled
    FROM ctx
    """,
)
def interpolate_gapfill_hourly(spark, sf_dir):
    """Hourly per-type event-value series with LINEAR INTERPOLATION across
    missing hours (the timescale-style ``interpolate(avg(value))`` rollup —
    unlike ``date_series_gap_fill`` which zero-fills). Missing buckets get
    pv + (nv-pv) * Δt/Δtotal between the bracketing observed hours; leading/
    trailing gaps take the nearest observed value.

    Scale: the hourly pre-aggregation collapses the raw scan before any
    window; the spine is one row per (type, hour) — O(types x span), not
    O(events); both IGNORE-NULLS windows partition by type so no global
    single-task window exists. Hour arithmetic uses calendar timestampdiff,
    immune to session-timezone/DST skew. The lerp runs in exact integer
    arithmetic (1e4-scaled values, integer-weighted average, one final
    division) so both engines produce bit-identical doubles — float lerp
    lands exactly on round-half boundaries at rational fractions."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.round(F.avg("value") * 10000).cast("bigint").alias("vi"))
    bounds = hourly.groupBy("event_type").agg(
        F.min("hour").alias("lo"), F.max("hour").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    joined = spine.join(hourly, ["event_type", "hour"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hour = F.when(F.col("vi").isNotNull(), F.col("hour"))
    ctx = joined.select(
        "event_type",
        "hour",
        "vi",
        F.last("vi", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_hour, ignorenulls=True).over(wp).alias("ph"),
        F.first("vi", ignorenulls=True).over(wn).alias("nv"),
        F.first(obs_hour, ignorenulls=True).over(wn).alias("nh"),
    )
    num = F.col("pv") * F.expr("timestampdiff(HOUR, hour, nh)") + F.col(
        "nv"
    ) * F.expr("timestampdiff(HOUR, ph, hour)")
    den = F.expr("timestampdiff(HOUR, ph, nh)") * F.lit(10000.0)
    filled = (
        F.when(F.col("vi").isNotNull(), F.col("vi") / 10000.0)
        .when(F.col("pv").isNull(), F.col("nv") / 10000.0)
        .when(F.col("nv").isNull(), F.col("pv") / 10000.0)
        .otherwise(num.cast("double") / den)
    )
    return ctx.select(
        "event_type",
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("vi").isNull().alias("interpolated"),
        filled.alias("value_filled"),
    )


# --------------------------------------------------------------------------
# Bipartite projection: co-purchase similarity + triadic closure
# --------------------------------------------------------------------------

_COPURCHASE_CTE = """
    cs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    deg AS (SELECT s, COUNT(*) AS d FROM cs GROUP BY s),
    pairs AS (
      SELECT a.s AS supp_a, b.s AS supp_b, COUNT(*) AS shared
      FROM cs a JOIN cs b ON a.c = b.c AND a.s < b.s
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT p.supp_a, p.supp_b, p.shared,
             ROUND(p.shared * 1.0 / (da.d + db.d - p.shared), 6) AS jaccard
      FROM pairs p
      JOIN deg da ON da.s = p.supp_a
      JOIN deg db ON db.s = p.supp_b
    )"""


def _scored_supplier_pairs(spark, sf_dir):
    from evolution_spark.operators.graph import project_bipartite

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    cs = l.join(o, l.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
    )
    pairs = project_bipartite(cs, left="c", right="s").select(
        F.col("a").alias("supp_a"), F.col("b").alias("supp_b"), "shared"
    )
    deg = cs.distinct().groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    return (
        pairs.join(
            F.broadcast(deg.select(F.col("s").alias("supp_a"), F.col("d").alias("da"))),
            "supp_a",
        )
        .join(
            F.broadcast(deg.select(F.col("s").alias("supp_b"), F.col("d").alias("db"))),
            "supp_b",
        )
        .select(
            "supp_a",
            "supp_b",
            "shared",
            F.round(
                F.col("shared") / (F.col("da") + F.col("db") - F.col("shared")), 6
            ).alias("jaccard"),
        )
    )


@query(
    "copurchase_similarity",
    oracle=f"""
    WITH {_COPURCHASE_CTE}
    SELECT supp_a, supp_b, shared, jaccard FROM scored
    ORDER BY jaccard DESC, supp_a, supp_b LIMIT 20
    """,
)
def copurchase_similarity(spark, sf_dir):
    """Item-item collaborative-filtering similarity: project the bipartite
    customer->supplier purchase graph onto suppliers (operators/graph.py:
    project_bipartite) and rank pairs by customer-set Jaccard. Top 20.

    Scale: the projection self-join is bounded by per-customer degree (the
    operator's max_left_degree guard handles web-scale hubs; TPC-H-shaped
    degrees need no cap); supplier degree tables are dimension-sized and
    broadcast; the top-k is a TakeOrderedAndProject. Jaccard is a single
    exact integer division, so ordering is bit-identical across engines."""
    return _scored_supplier_pairs(spark, sf_dir).orderBy(
        F.desc("jaccard"), "supp_a", "supp_b"
    ).limit(20)


@query(
    "triangle_count_copurchase",
    oracle=f"""
    WITH {_COPURCHASE_CTE},
    top AS (
      SELECT supp_a AS a, supp_b AS b FROM scored
      ORDER BY jaccard DESC, supp_a, supp_b LIMIT 200
    ),
    sym AS (
      SELECT a AS u, b AS v FROM top UNION SELECT b, a FROM top
    ),
    vdeg AS (SELECT u, COUNT(*) AS d FROM sym GROUP BY u),
    oriented AS (
      SELECT s.u, s.v FROM sym s
      JOIN vdeg du ON du.u = s.u JOIN vdeg dv ON dv.u = s.v
      WHERE du.d < dv.d OR (du.d = dv.d AND s.u < s.v)
    ),
    wedge AS (
      SELECT o1.u AS a, o1.v AS b, o2.v AS c
      FROM oriented o1 JOIN oriented o2 ON o1.v = o2.u
    ),
    closed AS (
      SELECT w.a, w.c FROM wedge w JOIN oriented o ON o.u = w.a AND o.v = w.c
    )
    SELECT (SELECT COUNT(*) FROM oriented) AS n_edges,
           (SELECT COUNT(*) FROM wedge) AS n_wedges,
           (SELECT COUNT(*) FROM closed) AS n_triangles
    """,
)
def triangle_count_copurchase(spark, sf_dir):
    """Triadic closure of the top-200 co-purchase similarity pairs: exact
    triangle count via the degree-oriented wedge join (operators/graph.py:
    count_triangles — each triangle enumerated once along the (degree, id)
    total order, which bounds wedges by O(m^1.5) on skew). Measures
    how clique-like the strongest similarity edges are — the structural
    signal behind community detection on the similarity graph.

    Scale: the similarity graph is capped at the top-200 edges
    (TakeOrderedAndProject — deterministic because Jaccard is one exact
    division), so wedge cardinality is bounded by 200^2 regardless of
    corpus size; the wedge and closure joins shuffle only id pairs."""
    from evolution_spark.operators.graph import count_triangles

    top = (
        _scored_supplier_pairs(spark, sf_dir)
        .orderBy(F.desc("jaccard"), "supp_a", "supp_b")
        .limit(200)
        .select(F.col("supp_a").alias("a"), F.col("supp_b").alias("b"))
    )
    return count_triangles(top, src="a", dst="b")


# --------------------------------------------------------------------------
# Sweep-line concurrency: peak simultaneous sessions per day
# --------------------------------------------------------------------------


@query(
    "concurrent_sessions_peak",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(CASE WHEN gap > 1800000000 THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS session_id
      FROM gaps
    ),
    sess AS (
      SELECT user_id, session_id, MIN(ts) AS s, MAX(ts) AS e
      FROM numbered GROUP BY 1, 2
    ),
    marks AS (
      SELECT s AS t, 1 AS delta FROM sess
      UNION ALL
      SELECT e AS t, -1 AS delta FROM sess
    ),
    swept AS (
      SELECT t, delta,
             SUM(delta) OVER (ORDER BY t, delta
                              ROWS UNBOUNDED PRECEDING) AS running
      FROM marks
    )
    SELECT strftime(t, '%Y-%m-%d') AS day,
           CAST(MAX(running) AS BIGINT) AS peak_concurrency,
           CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts
    FROM swept GROUP BY 1
    """,
)
def concurrent_sessions_peak(spark, sf_dir):
    """Peak simultaneous user sessions per day — the classic sweep line:
    sessionize (30-min gap), emit (+1 at start, -1 at end) marks, take the
    GLOBAL running sum ordered by (time, delta) (ends sort before starts
    at the same instant, so touching sessions never double-count), and max
    it per day. Sessions spanning midnight carry into the next day's
    concurrency through the global prefix — a per-day window would lose
    them.

    Scale: the running sum uses operators/rank.global_running_sum — range
    partition + per-partition cumsum + metadata-sized prefix carries —
    never a single-task global window; marks are 2 rows per session, tiny
    next to the event scan. Per-day MAX is tie-order invariant (within a
    tie group the sum is monotone), so the result is deterministic even
    though intra-tie row values are not."""
    from evolution_spark.operators.rank import global_running_sum
    from evolution_spark.operators.temporal import sessionize

    e = table(spark, sf_dir, "events")
    sess = sessionize(e, key="user_id", ts_col="ts", gap_minutes=30, tiebreak="event_id")
    spans = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    marks = spans.select(F.col("s").alias("t"), F.lit(1).alias("delta")).unionAll(
        spans.select(F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    swept = global_running_sum(marks, ["t", "delta"], "delta", out_col="running")
    return swept.groupBy(F.date_format("t", "yyyy-MM-dd").alias("day")).agg(
        F.max("running").cast("bigint").alias("peak_concurrency"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_starts"),
    )


# --------------------------------------------------------------------------
# Rolling distinct count (7-day active users)
# --------------------------------------------------------------------------


@query(
    "rolling_distinct_users",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS active_7d,
           CAST(COUNT(DISTINCT CASE WHEN u.day = d.day THEN u.user_id END)
                AS BIGINT) AS active_1d
    FROM days d
    JOIN du u ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY d.day
    """,
)
def rolling_distinct_users(spark, sf_dir):
    """Rolling 7-day distinct active users per day — the window-distinct
    aggregate SQL windows cannot express (COUNT(DISTINCT) OVER is
    unsupported in Spark). Implemented by the contribution-explosion
    pattern: dedup to (day, user) pairs ONCE (the only full-data shuffle),
    then each pair contributes itself to the 7 window anchors it falls in
    (a 7-element sequence+explode — pure codegen) and one hash aggregation
    counts distinct users per anchor day. Daily actives ride along from
    the same exchange.

    Scale: cost is 7x the DEDUPED (day, user) cardinality — bounded by
    users x days, independent of raw event volume; no per-day self-join
    (the oracle's join formulation is the quadratic-ish naive version) and
    no window state. The anchor explosion generalizes to any fixed-width
    sliding distinct aggregate."""
    e = table(spark, sf_dir, "events")
    du = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    anchors = du.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add("day", 6))
        ).alias("anchor"),
        "day",
        "user_id",
    )
    # anchors beyond the observed range would fabricate trailing days;
    # restrict to days that actually occur (matches the oracle's spine)
    days = du.select("day").distinct().select(F.col("day").alias("anchor"))
    return (
        anchors.join(F.broadcast(days), "anchor")
        .groupBy("anchor")
        .agg(
            F.count_distinct("user_id").alias("active_7d"),
            F.count_distinct(
                F.when(F.col("day") == F.col("anchor"), F.col("user_id"))
            ).alias("active_1d"),
        )
        .select(
            F.date_format("anchor", "yyyy-MM-dd").alias("day"),
            "active_7d",
            "active_1d",
        )
    )


# --------------------------------------------------------------------------
# Association rules (market basket over co-ordered brands)
# --------------------------------------------------------------------------


@query(
    "brand_association_rules",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n_orders AS (SELECT COUNT(DISTINCT o) AS n FROM baskets),
    brand_n AS (SELECT b, COUNT(*) AS nb FROM baskets GROUP BY b),
    pairs AS (
      SELECT a.b AS lhs, c.b AS rhs, COUNT(*) AS nab
      FROM baskets a JOIN baskets c ON a.o = c.o AND a.b < c.b
      GROUP BY 1, 2
    )
    SELECT p.lhs, p.rhs, p.nab AS n_both,
           ROUND(p.nab * 1.0 / t.n, 6) AS support,
           ROUND(p.nab * 1.0 / la.nb, 6) AS confidence,
           ROUND((p.nab * 1.0 / t.n) / ((la.nb * 1.0 / t.n) * (lb.nb * 1.0 / t.n)),
                 4) AS lift
    FROM pairs p
    JOIN brand_n la ON la.b = p.lhs
    JOIN brand_n lb ON lb.b = p.rhs
    CROSS JOIN n_orders t
    WHERE p.nab >= 5
    ORDER BY lift DESC, lhs, rhs LIMIT 25
    """,
)
def brand_association_rules(spark, sf_dir):
    """Market-basket association rules over co-ordered part brands:
    support, confidence, and lift for every brand pair appearing in >= 5
    shared orders, top 25 by lift — the A-priori first level, which at
    two-item rules is a join-and-count, not an iterative miner.

    Scale: baskets dedup to (order, brand) — bounded by orders x brand
    domain; the pair self-join is quadratic only in per-ORDER brand count
    (single-digit), the brand marginals are domain-sized broadcasts, and
    the global order count rides in as a one-row broadcast crossJoin.
    Lift's division chain is identical scalar arithmetic on exact integer
    counts in both engines, so the top-k ordering is bit-deterministic."""
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # ONE shuffle on the order key builds the distinct per-order brand
    # SET (collect_set = the old distinct + self-join's grouping in one
    # pass); pairs come from an in-row sorted-array explode — per-order
    # brand count is single-digit, so the k^2 fan-out is bounded and
    # never crosses an exchange. The three consumers (pairs, brand
    # marginals, order count) hang off the same subtree; ReuseExchange
    # dedupes the one shuffle write, so re-aggregation per consumer is
    # post-shuffle-read only (A/B'd against an eager localCheckpoint,
    # which cost more than it saved at every scale tried).
    # No explicit broadcast hint on part: it scales linearly with SF, so a
    # forced broadcast could exceed executor memory at large scale where the
    # planner's autoBroadcastJoinThreshold decision degrades gracefully (it
    # still broadcasts whenever part fits, including at this fixture scale).
    sets_df = (
        l.join(p, l.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .groupBy("o")
        .agg(F.sort_array(F.collect_set("b")).alias("bs"))
    )
    total = sets_df.agg(F.count(F.lit(1)).alias("n"))
    brand_n = sets_df.select(F.explode("bs").alias("b")).groupBy("b").agg(
        F.count(F.lit(1)).alias("nb")
    )
    bs = F.col("bs")
    # ascending in-row pairs (lhs < rhs comes free from the sorted set)
    pair_structs = F.flatten(
        F.transform(
            bs,
            lambda x, i: F.transform(
                F.slice(bs, i + F.lit(2), F.size(bs)),
                lambda y: F.struct(x.alias("lhs"), y.alias("rhs")),
            ),
        )
    )
    pairs = (
        sets_df.select(F.explode(pair_structs).alias("pr"))
        .groupBy(F.col("pr.lhs").alias("lhs"), F.col("pr.rhs").alias("rhs"))
        .agg(F.count(F.lit(1)).alias("nab"))
        .where(F.col("nab") >= 5)
    )
    scored = (
        pairs.join(
            F.broadcast(brand_n.select(F.col("b").alias("lhs"), F.col("nb").alias("na"))),
            "lhs",
        )
        .join(
            F.broadcast(brand_n.select(F.col("b").alias("rhs"), F.col("nb").alias("nb2"))),
            "rhs",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "lhs",
            "rhs",
            F.col("nab").alias("n_both"),
            F.round(F.col("nab") / F.col("n"), 6).alias("support"),
            F.round(F.col("nab") / F.col("na"), 6).alias("confidence"),
            F.round(
                (F.col("nab") / F.col("n"))
                / ((F.col("na") / F.col("n")) * (F.col("nb2") / F.col("n"))),
                4,
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), "lhs", "rhs").limit(25)


# --------------------------------------------------------------------------
# Time-weighted average (TWAP)
# --------------------------------------------------------------------------


@query(
    "time_weighted_average",
    oracle="""
    WITH seq AS (
      SELECT event_type, value, ts,
             LEAD(ts) OVER (PARTITION BY event_type, CAST(ts AS DATE)
                            ORDER BY ts, event_id) AS nts
      FROM events
    ),
    weighted AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             value, epoch_us(nts) - epoch_us(ts) AS dt
      FROM seq WHERE nts IS NOT NULL
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           ROUND(SUM(value * dt) / SUM(dt), 2) AS twap
    FROM weighted GROUP BY event_type, day
    """,
)
def time_weighted_average(spark, sf_dir):
    """Daily TWAP (time-weighted average) of event values per type: each
    observation is weighted by how long it REMAINED the latest value
    (duration to the next observation within the day), the standard
    irregular-sampling average that a plain AVG gets wrong whenever
    sampling density correlates with value. The financial/metrics rollup
    the reference's fixed-interval pipeline cannot express.

    Scale: one window shuffle on (type, day) for the lead, then a hash
    aggregation — durations are exact integer microseconds
    (micros_since_epoch, NTZ-safe), so weights are identical across
    engines and only the final division rounds."""
    from evolution_spark.functions.time import micros_since_epoch

    e = table(spark, sf_dir, "events")
    day = F.to_date("ts")
    w = Window.partitionBy("event_type", day).orderBy("ts", "event_id")
    us = micros_since_epoch(e, "ts")
    seq = e.select(
        "event_type",
        day.alias("day"),
        "value",
        (F.lead(us).over(w) - us).alias("dt"),
    ).where(F.col("dt").isNotNull())
    return seq.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.round(F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 2).alias("twap"),
    ).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_intervals",
        "twap",
    )


# --------------------------------------------------------------------------
# OHLC bars (open/high/low/close per type per day)
# --------------------------------------------------------------------------


@query(
    "ohlc_daily_bars",
    oracle="""
    WITH keyed AS (
      SELECT event_type, CAST(ts AS DATE) AS day, value,
             lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '-' ||
             lpad(CAST(event_id AS VARCHAR), 10, '0') AS ord
      FROM events
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           ROUND(arg_min(value, ord), 2) AS open,
           ROUND(MAX(value), 2) AS high,
           ROUND(MIN(value), 2) AS low,
           ROUND(arg_max(value, ord), 2) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM keyed
    GROUP BY 1, 2
    """,
)
def ohlc_daily_bars(spark, sf_dir):
    """Daily OHLC candlesticks per event type: open/close via min_by/max_by
    on the full (ts, event_id) ordering key (tie-proof — two ticks in the
    same microsecond resolve identically in both engines), high/low as
    plain extremes. The canonical downsampling of a tick stream to bars.

    Scale: ONE hash aggregation with map-side combine — min_by/max_by
    carry a single (value, key) pair per partial state, so the shuffle is
    group-count-sized regardless of tick volume. No window, no sort. The
    ordering key is a fixed-width "<epoch_us>-<event_id>" string whose
    lexicographic order equals the numeric order (DuckDB's arg_min/max
    take scalar keys, not structs)."""
    from evolution_spark.functions.time import micros_since_epoch

    e = table(spark, sf_dir, "events")
    key = F.format_string(
        "%020d-%010d", micros_since_epoch(e, "ts"), F.col("event_id")
    )
    return e.groupBy(
        "event_type", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.round(F.min_by("value", key), 2).alias("open"),
        F.round(F.max("value"), 2).alias("high"),
        F.round(F.min("value"), 2).alias("low"),
        F.round(F.max_by("value", key), 2).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


# --------------------------------------------------------------------------
# Day-of-week seasonality profile
# --------------------------------------------------------------------------


@query(
    "dow_seasonality_profile",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    prof AS (
      SELECT event_type, dayofweek(day) + 1 AS dow,
             CAST(SUM(n) AS BIGINT) AS n_events,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type,
             CAST(SUM(n_events) AS BIGINT) AS te,
             CAST(SUM(n_days) AS BIGINT) AS td
      FROM prof GROUP BY 1
    )
    SELECT p.event_type, p.dow, p.n_events, p.n_days,
           ROUND((p.n_events * 1.0 / p.n_days) / (t.te * 1.0 / t.td), 4)
             AS seasonal_index
    FROM prof p JOIN tot t USING (event_type)
    """,
)
def dow_seasonality_profile(spark, sf_dir):
    """Day-of-week seasonality: per (type, weekday), the ratio of that
    weekday's average daily event volume to the type's overall daily
    average — the multiplicative seasonal index behind deseasonalized
    anomaly thresholds (a Monday spike is only a spike relative to
    Mondays). Weekday convention: Spark's dayofweek is 1=Sunday while
    DuckDB's is 0=Sunday, so the oracle shifts by one to the shared
    1-7 Sunday-first numbering.

    Scale: two-level aggregation (daily pre-collapse, then the 7-row
    weekday profile) + a type-level broadcast join — the raw scan
    collapses immediately, everything after is domain-sized."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    prof = daily.groupBy(
        "event_type", F.dayofweek("day").alias("dow")
    ).agg(
        F.sum("n").alias("n_events"),
        F.count(F.lit(1)).alias("n_days"),
    )
    tot = prof.groupBy("event_type").agg(
        F.sum("n_events").alias("te"), F.sum("n_days").alias("td")
    )
    return prof.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "dow",
        "n_events",
        "n_days",
        F.round(
            (F.col("n_events") / F.col("n_days")) / (F.col("te") / F.col("td")), 4
        ).alias("seasonal_index"),
    )


# --------------------------------------------------------------------------
# Grouped least-squares trend (exact-integer regression)
# --------------------------------------------------------------------------


@query(
    "linear_trend_by_type",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    anchored AS (
      SELECT event_type,
             CAST(day - MIN(day) OVER (PARTITION BY event_type) AS BIGINT) AS x,
             y
      FROM daily
    ),
    sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM anchored GROUP BY 1
    )
    SELECT event_type, n,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0, 4) AS slope_per_day,
           ROUND(CAST(sy * sxx - sx * sxy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0, 2) AS intercept,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
    FROM sums
    """,
)
def linear_trend_by_type(spark, sf_dir):
    """Per-type least-squares trend of daily event value: slope
    (currency/day), intercept, and R² from the closed-form normal
    equations over exact integer sums — the grouped regression behind
    "is this metric drifting", computable in two hash aggregations with
    no iterative solver. All moments (Σx, Σy, Σxy, Σx², Σy²) are exact
    int64 (x is a small day index anchored at each type's first day; y is
    cent-scaled), so both engines do identical float work: one division
    per statistic.

    Scale: the raw scan collapses to one row per (type, day) immediately;
    the per-type min-day anchor is a window over that daily frame (group
    domain, not event volume); the moments aggregation is map-side
    combined."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("y"))
    w = Window.partitionBy("event_type")
    anchored = daily.select(
        "event_type",
        F.datediff("day", F.min("day").over(w)).cast("bigint").alias("x"),
        "y",
    )
    sums = anchored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    num = (n * sxy - sx * sy).cast("double")
    den = (n * sxx - sx * sx).cast("double")
    return sums.select(
        "event_type",
        "n",
        F.round(num / den / 100.0, 4).alias("slope_per_day"),
        F.round((sy * sxx - sx * sxy).cast("double") / den / 100.0, 2).alias(
            "intercept"
        ),
        F.round(num * num / (den * (n * syy - sy * sy).cast("double")), 6).alias("r2"),
    )


# --------------------------------------------------------------------------
# Growth accounting: daily new vs returning users
# --------------------------------------------------------------------------


@query(
    "daily_new_vs_returning",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    firsts AS (SELECT user_id, MIN(day) AS first_day FROM du GROUP BY 1)
    SELECT strftime(du.day, '%Y-%m-%d') AS day,
           CAST(SUM(CASE WHEN du.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS new_users,
           CAST(SUM(CASE WHEN du.day > f.first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS returning_users
    FROM du JOIN firsts f USING (user_id)
    GROUP BY du.day
    """,
)
def daily_new_vs_returning(spark, sf_dir):
    """Growth accounting: per day, how many active users are NEW (first
    ever active day) vs RETURNING — the decomposition behind every DAU
    chart. One (day, user) dedup, a per-user first-day aggregate, and a
    user-keyed join back; all shuffles are bounded by users x days, not
    event volume. (A window MIN over user_id would fuse the agg+join into
    one shuffle; the join form keeps the first-day frame reusable.)"""
    e = table(spark, sf_dir, "events")
    du = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    firsts = du.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        du.join(firsts, "user_id")
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum((F.col("day") == F.col("first_day")).cast("long")).alias(
                "new_users"
            ),
            F.sum((F.col("day") > F.col("first_day")).cast("long")).alias(
                "returning_users"
            ),
        )
    )


# --------------------------------------------------------------------------
# RFM segmentation
# --------------------------------------------------------------------------


@query(
    "rfm_segments",
    oracle="""
    WITH stats AS (
      SELECT o_custkey,
             date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                       (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders))
               AS recency_days,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY o_custkey
    ),
    seg AS (
      SELECT *,
             CASE WHEN recency_days <= 90 AND frequency >= 10 THEN 'champion'
                  WHEN recency_days <= 90 THEN 'recent'
                  WHEN frequency >= 10 THEN 'loyal_lapsing'
                  ELSE 'at_risk' END AS segment
      FROM stats
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary_cents) AS BIGINT) AS total_cents,
           ROUND(AVG(frequency), 4) AS avg_frequency,
           CAST(MIN(recency_days) AS BIGINT) AS min_recency,
           CAST(MAX(recency_days) AS BIGINT) AS max_recency
    FROM seg GROUP BY segment
    """,
)
def rfm_segments(spark, sf_dir):
    """RFM (recency / frequency / monetary) customer segmentation: per
    customer, days since last order relative to the dataset's horizon,
    order count, and cent-exact lifetime value, bucketed into the classic
    four quadrants and summarized per segment. The standard curation of a
    customer base into actionable cohorts.

    Scale: one customer-keyed aggregation (map-side combined) + a one-row
    global max-date broadcast (crossJoin); segmentation is a pure codegen
    CASE; the final rollup is four rows. avg_frequency is an exact
    integer-sum ratio, identical across engines."""
    o = table(spark, sf_dir, "orders")
    horizon = o.agg(F.max(F.to_date("o_orderdate")).alias("hmax"))
    stats = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_day"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "monetary_cents"
            ),
        )
        .crossJoin(F.broadcast(horizon))
        .withColumn("recency_days", F.datediff("hmax", "last_day").cast("bigint"))
    )
    seg = stats.withColumn(
        "segment",
        F.when(
            (F.col("recency_days") <= 90) & (F.col("frequency") >= 10), "champion"
        )
        .when(F.col("recency_days") <= 90, "recent")
        .when(F.col("frequency") >= 10, "loyal_lapsing")
        .otherwise("at_risk"),
    )
    return seg.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("monetary_cents").alias("total_cents"),
        F.round(F.avg("frequency"), 4).alias("avg_frequency"),
        F.min("recency_days").alias("min_recency"),
        F.max("recency_days").alias("max_recency"),
    )


# --------------------------------------------------------------------------
# Fulfillment lag percentiles (order -> ship latency SLA)
# --------------------------------------------------------------------------


@query(
    "fulfillment_lag_percentiles",
    oracle="""
    WITH lag AS (
      SELECT o.o_orderpriority AS priority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS lag_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           quantile_cont(lag_days, 0.5)  AS p50_days,
           quantile_cont(lag_days, 0.9)  AS p90_days,
           quantile_cont(lag_days, 0.99) AS p99_days,
           CAST(MAX(lag_days) AS BIGINT) AS max_days
    FROM lag GROUP BY priority
    """,
)
def fulfillment_lag_percentiles(spark, sf_dir):
    """Order-to-ship latency SLA per priority class: exact interpolated
    p50/p90/p99 of the day lag between order date and each line's ship
    date — the latency-distribution readout every SLA dashboard needs,
    exact rather than sketch-based (integer day inputs make Spark
    ``percentile`` and DuckDB ``quantile_cont`` bit-identical).

    Scale: the join shuffles on orderkey once (AQE may broadcast orders'
    two columns); one percentile buffer carries all three quantiles; at
    100 TB the one-pass sketch twin is ``approx_percentile_prices``'s
    t-digest pattern."""
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lag = l.join(o, l.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "lag_days"
        ),
    )
    pcts = F.percentile("lag_days", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return lag.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        pcts.getItem(0).alias("p50_days"),
        pcts.getItem(1).alias("p90_days"),
        pcts.getItem(2).alias("p99_days"),
        F.max("lag_days").cast("bigint").alias("max_days"),
    )


# --------------------------------------------------------------------------
# Zipf exponent of the corpus word-frequency distribution
# --------------------------------------------------------------------------


@query(
    "zipf_exponent",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    freq AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM words
      WHERE w <> '' GROUP BY w
    ),
    ranked AS (
      SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS r
      FROM freq
      ORDER BY n DESC, w LIMIT 1000
    ),
    logs AS (SELECT ln(r) AS x, ln(n) AS y FROM ranked),
    sums AS (
      SELECT COUNT(*) AS k, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy
      FROM logs
    )
    SELECT CAST(k AS BIGINT) AS n_ranks,
           ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 4) AS zipf_slope
    FROM sums
    """,
)
def zipf_exponent(spark, sf_dir):
    """Zipf exponent of the corpus: least-squares slope of log-frequency
    vs log-rank over the top-1000 words (natural language sits near -1;
    a synthetic or heavily deduplicated corpus drifts away — a one-number
    corpus-health signal).

    Scale: word counts are a hash aggregation; the top-1000 selection is
    a TakeOrderedAndProject (per-task heaps, deterministic freq-desc/word
    tie-break), and only THAT bounded frame enters the single-partition
    ranking window — the window cost is O(1000) regardless of vocabulary
    size. The log-space regression reuses the closed-form normal
    equations; cross-engine libm drift (~1 ulp/term) is ~1e-13 relative
    on the summed moments, nine orders below the 4-dp rounding
    boundary."""
    d = table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = freq.orderBy(F.desc("n"), "w").limit(1000)
    ranked = top.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("n"), "w"))
    )
    logs = ranked.select(F.log("r").alias("x"), F.log("n").alias("y"))
    sums = logs.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    k, sx, sy = F.col("k"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    return sums.select(
        k.cast("bigint").alias("n_ranks"),
        F.round((k * sxy - sx * sy) / (k * sxx - sx * sx), 4).alias("zipf_slope"),
    )


# --------------------------------------------------------------------------
# Revenue concentration (Pareto 80/20)
# --------------------------------------------------------------------------


@query(
    "revenue_concentration",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t,
                   CAST(COUNT(*) AS BIGINT) AS nc FROM cust),
    run AS (
      SELECT cents,
             SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                              ROWS UNBOUNDED PRECEDING) AS cum,
             ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS r
      FROM cust
    )
    SELECT t.nc AS n_customers,
           CAST(MIN(CASE WHEN run.cum * 5 >= t.t * 4 THEN run.r END) AS BIGINT)
             AS n_for_80pct,
           ROUND(MIN(CASE WHEN run.cum * 5 >= t.t * 4 THEN run.r END)
                 * 1.0 / t.nc, 4) AS frac_for_80pct
    FROM run CROSS JOIN tot t
    GROUP BY t.nc
    """,
)
def revenue_concentration(spark, sf_dir):
    """Pareto concentration: the smallest number (and fraction) of
    customers whose cumulative revenue reaches 80% of the total — the
    80/20 readout behind key-account analysis. Cumulative revenue is an
    EXACT integer running sum (cents) under the global (revenue desc,
    custkey) order, so the crossing rank is integer-deterministic
    (cum*5 >= total*4 avoids any float threshold entirely).

    Scale: per-customer totals are one keyed aggregation; the global
    cumulative sum uses operators/rank.global_running_sum (range
    partition + metadata-sized carries — no single-task window, unlike
    the oracle's formulation); the crossing detection is a one-row
    aggregate with the totals broadcast in."""
    from evolution_spark.operators.rank import global_running_sum_with_rank

    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
    )
    neg = cust.withColumn("__negc", -F.col("cents"))
    # fused cum+rank (r15): one range exchange + one checkpoint instead of
    # the stacked global_running_sum -> with_global_rank pair, which paid
    # the identical range layout twice (keys are unique, so cum and rank
    # are bit-identical to the stacked form)
    run = global_running_sum_with_rank(
        neg, ["__negc", "o_custkey"], "cents", out_col="cum", rank_col="r"
    )
    tot = cust.agg(
        F.sum("cents").alias("t"), F.count(F.lit(1)).alias("nc")
    )
    crossed = run.crossJoin(F.broadcast(tot)).where(
        F.col("cum") * 5 >= F.col("t") * 4
    )
    return crossed.groupBy(F.col("nc").alias("n_customers")).agg(
        F.min("r").alias("n_for_80pct"),
        F.round(F.min("r") / F.first("nc"), 4).alias("frac_for_80pct"),
    )
