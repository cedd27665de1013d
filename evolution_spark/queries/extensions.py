"""Oracle queries for the extension operators: multi-granularity time
rollup, IVF cell assignment, and embedding near-dup with planted duplicates
(the testdata has no natural near-identical vectors, so the query plants
them deterministically — both engines construct the same perturbed copies)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from evolution_spark.operators.rollup import time_rollup
from evolution_spark.queries.base import query, table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@query(
    "time_rollup_multi",
    oracle="""
    WITH g AS (SELECT unnest(['hour', 'day']) AS granularity)
    SELECT g.granularity,
           strftime(CASE WHEN g.granularity = 'hour' THEN date_trunc('hour', ts)
                         ELSE date_trunc('day', ts) END, '%Y-%m-%d %H:%M:%S') AS bucket,
           event_type,
           COUNT(*) AS n,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS sum_value
    FROM events CROSS JOIN g
    GROUP BY 1, 2, 3
    """,
)
def time_rollup_multi(spark, sf_dir):
    """Hypertable-style continuous aggregate: hour + day levels in ONE
    shuffle (operators/rollup.py)."""
    e = table(spark, sf_dir, "events")
    rolled = time_rollup(
        e,
        "ts",
        ["hour", "day"],
        aggs={
            "n": F.count(F.lit(1)),
            "sum_value": F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0,
        },
        keys=["event_type"],
    )
    return rolled.select(
        "granularity",
        F.date_format("bucket_start", _TS_FMT).alias("bucket"),
        "event_type",
        "n",
        "sum_value",
    )


@query(
    "ivf_cell_assignment",
    oracle="""
    WITH hashed AS (
      SELECT vec_id, embedding,
             ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,8))::BIGINT AS h
      FROM embeddings
    ), centroids AS (
      SELECT ROW_NUMBER() OVER (ORDER BY h, vec_id) AS cell_id,
             embedding AS centroid
      FROM hashed
      ORDER BY h, vec_id LIMIT 8
    ), scored AS (
      SELECT e.vec_id, c.cell_id,
             sqrt(list_inner_product(
                 list_transform(range(64), i -> e.embedding[i+1]::DOUBLE - c.centroid[i+1]::DOUBLE),
                 list_transform(range(64), i -> e.embedding[i+1]::DOUBLE - c.centroid[i+1]::DOUBLE)
             )) AS dist
      FROM embeddings e CROSS JOIN centroids c
    )
    SELECT vec_id, cell_id FROM (
      SELECT vec_id, cell_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell_id) AS rn
      FROM scored) WHERE rn = 1
    """,
)
def ivf_cell_assignment(spark, sf_dir):
    """IVF build step: deterministic sampled centroids + nearest-cell
    assignment (operators/ivf.py). The cell histogram is the partition-size
    profile of the ANN index."""
    from evolution_spark.operators.ivf import assign_cells, sample_centroids

    e = table(spark, sf_dir, "embeddings")
    centroids = sample_centroids(e, "vec_id", "embedding", 8)
    assigned = assign_cells(e, centroids, "vec_id", "embedding")
    return assigned.select("vec_id", "cell_id")


@query(
    "embedding_near_dup_planted",
    oracle="""
    WITH planted AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id,
             list_transform(embedding::DOUBLE[], x -> x * 1.0000001) AS v
      FROM embeddings WHERE vec_id % 100 = 0
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM planted a JOIN planted b ON a.vec_id + 1000000 = b.vec_id
    WHERE (list_inner_product(a.v, b.v)
           / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))))
          >= 0.9999
    """,
)
def embedding_near_dup_planted(spark, sf_dir):
    """Embedding near-duplicate detection with planted duplicates: every
    100th vector gets a 1e-7-perturbed copy; cosine >= 0.9999 must recover
    exactly the planted pairs. (Production pair generation goes through the
    LSH buckets — operators/dedup.embedding_near_dups; this query verifies
    the similarity math end-to-end against the oracle.)"""
    from evolution_spark.functions.vectors import cosine

    e = table(spark, sf_dir, "embeddings")
    base = e.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    planted = base.unionByName(
        e.where(F.col("vec_id") % 100 == 0).select(
            (F.col("vec_id") + 1000000).alias("vec_id"),
            F.transform("embedding", lambda x: x.cast("double") * 1.0000001).alias("v"),
        )
    )
    a = planted.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = planted.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("id_a") + 1000000 == F.col("id_b"))
        .where(cosine(F.col("va"), F.col("vb")) >= 0.9999)
        .select("id_a", "id_b")
    )


@query(
    "semdedup_prune_summary",
    oracle="""
    WITH planted AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id,
             list_transform(embedding::DOUBLE[], x -> x * 1.0000001) AS v
      FROM embeddings WHERE vec_id % 50 = 0
    ), hashed AS (
      SELECT vec_id, v,
             ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,8))::BIGINT AS h
      FROM planted
    ), centroids AS (
      SELECT ROW_NUMBER() OVER (ORDER BY h, vec_id) AS cell_id, v AS centroid
      FROM hashed ORDER BY h, vec_id LIMIT 32
    ), scored AS (
      SELECT p.vec_id, c.cell_id,
             sqrt(list_inner_product(
                 list_transform(range(64), i -> p.v[i+1] - c.centroid[i+1]),
                 list_transform(range(64), i -> p.v[i+1] - c.centroid[i+1])
             )) AS dist
      FROM planted p CROSS JOIN centroids c
    ), assigned AS (
      SELECT vec_id, cell_id FROM (
        SELECT vec_id, cell_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell_id) AS rn
        FROM scored) WHERE rn = 1
    ), pruned AS (
      SELECT DISTINCT bc.vec_id
      FROM assigned a
      JOIN planted pa ON a.vec_id = pa.vec_id
      JOIN assigned bc ON a.cell_id = bc.cell_id AND a.vec_id < bc.vec_id
      JOIN planted pb ON bc.vec_id = pb.vec_id
      WHERE list_inner_product(pa.v, pb.v)
            / (sqrt(list_inner_product(pa.v, pa.v))
               * sqrt(list_inner_product(pb.v, pb.v))) >= 0.999
    )
    SELECT a.cell_id, COUNT(*) AS n_members,
           CAST(SUM(CASE WHEN pr.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pruned
    FROM assigned a LEFT JOIN pruned pr ON a.vec_id = pr.vec_id
    GROUP BY a.cell_id
    """,
)
def semdedup_prune_summary(spark, sf_dir):
    """SemDeDup (operators/dedup.semdedup, after Abbas et al. 2023):
    cluster the embedding space (deterministic sampled centroids + the
    zero-shuffle broadcast argmin of operators/ivf.py), then prune
    within-cluster cosine near-duplicates with the keep-lowest-id rule.
    Every 50th vector gets a 1e-7-perturbed planted copy, so the prune
    provably fires: the summary counts members and pruned rows per cell,
    and any mis-assignment, missed pair, or over-prune breaks the hash."""
    from evolution_spark.operators.dedup import semdedup

    e = table(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    planted = base.unionByName(
        e.where(F.col("vec_id") % 50 == 0).select(
            (F.col("vec_id") + 1000000).alias("vec_id"),
            F.transform("embedding", lambda x: x.cast("double") * 1.0000001).alias("v"),
        )
    )
    marked = semdedup(planted, "vec_id", "v", n_cells=32, threshold=0.999)
    return marked.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(F.when(F.col("is_pruned"), 1).otherwise(0)).alias("n_pruned"),
    )


@query(
    "fuzzy_join_supplier_names",
    oracle="""
    SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
           levenshtein(a.s_name, b.s_name) AS dist
    FROM supplier a, supplier b
    WHERE a.s_suppkey < b.s_suppkey
      AND levenshtein(a.s_name, b.s_name) <= 1
    """,
)
def fuzzy_join_supplier_names(spark, sf_dir):
    """Edit-distance similarity self-join (operators/fuzzy.py, PassJoin
    segment filtering): supplier-name pairs within Levenshtein distance 1
    — the record-linkage primitive behind entity resolution and
    typo-tolerant dedup. The Spark plan builds candidates from (length,
    slot, segment) equality joins and verifies with the built-in JVM
    ``levenshtein``; the oracle is the brute-force quadratic filter —
    tractable for DuckDB at oracle scale, exactly what the segment filter
    avoids at corpus scale. Results are exact (lossless pigeonhole), so
    the hash must match the cross join's."""
    from evolution_spark.operators.fuzzy import edit_distance_join

    s = table(spark, sf_dir, "supplier")
    return edit_distance_join(
        s.select(F.col("s_suppkey").alias("id"), F.col("s_name").alias("name")),
        "id",
        "name",
        k=1,
    )


@query("hll_sketch_mergeable")  # no oracle: DataSketches estimate by design
def hll_sketch_mergeable(spark, sf_dir):
    """Mergeable distinct-count sketches: per-day HLL sketches of ``user_id``
    (``hll_sketch_agg``), merged with ``hll_union_agg`` into one global
    estimate. Unlike a plain approx_count_distinct, the per-day sketch
    column can be PERSISTED and re-merged over any date range without
    rescanning raw events — the 100 TB pattern for distinct-count rollups
    (one scan ever; merges are O(sketch) not O(data)). Driver records the
    rows-only check (estimates are engine-specific by design)."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", 14).alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("distinct_users_est"),
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n_events").alias("n_events"),
    )


@query(
    "count_min_heavy_hitters",
    oracle="""
    SELECT event_type, COUNT(*) AS est_count
    FROM events GROUP BY event_type
    """,
)
def count_min_heavy_hitters(spark, sf_dir):
    """Mergeable frequency sketches: per-day count-min sketches of
    ``event_type`` (Spark's ``count_min_sketch`` aggregate, seeded), merged
    into one global sketch, probed for every observed key.

    The per-day binary column is the persistable artifact — at 100 TB the
    raw log is scanned ONCE; any date-range heavy-hitter query afterwards
    is an O(sketch) merge of KB-sized binaries, never a rescan. Spark has
    no SQL-level CMS merge/probe, so the merge happens on the driver via
    the JVM CountMinSketch class — legitimate here because what crosses to
    the driver is a handful of ~200 KB sketches (metadata-sized), not data.

    The exact-count oracle is sound: estimate = min over depth rows, and a
    key's estimate exceeds its true count only if it collides in EVERY row
    — P < (k/width)^depth ≈ 1e-17 at width 2719, depth 7 for the handful
    of event types, so the seeded sketch returns exact counts here."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr("count_min_sketch(event_type, 0.001d, 0.999d, 42)").alias("cms")
    )
    jvm = spark.sparkContext._jvm
    merged = None
    for r in daily.collect():  # KB-sized binaries, one per day
        bb = jvm.java.io.ByteArrayInputStream(bytes(r.cms))
        sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bb)
        merged = sk if merged is None else merged.mergeInPlace(sk)
    types = sorted(r.event_type for r in e.select("event_type").distinct().collect())
    data = [(t, int(merged.estimateCount(t))) for t in types]
    return spark.createDataFrame(data, "event_type string, est_count bigint")


@query(
    "rolling_features_events",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
           COUNT(*) OVER w AS roll_cnt,
           CAST(SUM(cents) OVER w AS BIGINT) AS roll_sum_cents,
           CAST(MIN(cents) OVER w AS BIGINT) AS roll_min_cents,
           CAST(MAX(cents) OVER w AS BIGINT) AS roll_max_cents,
           CAST(SUM(cents) OVER w AS BIGINT) / (COUNT(*) OVER w * CAST(100 AS DOUBLE)) AS roll_avg
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_features_events(spark, sf_dir):
    """Per-user rolling 5-row features (count/sum/min/max/mean of value) —
    the time-series featurization step of an events pipeline. Values scale
    to integer cents BEFORE the rolling sum so the window arithmetic is
    exact in both engines (float accumulation order inside a frame is not
    cross-engine reproducible); the mean divides the exact sum once.

    Plan: one shuffle on user_id, one window pass, bounded row frame."""
    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
        F.count(F.lit(1)).over(w).alias("roll_cnt"),
        F.sum(cents).over(w).alias("roll_sum_cents"),
        F.min(cents).over(w).alias("roll_min_cents"),
        F.max(cents).over(w).alias("roll_max_cents"),
        (
            F.sum(cents).over(w)
            / (F.count(F.lit(1)).over(w) * F.lit(100).cast("double"))
        ).alias("roll_avg"),
    )


@query(
    "skew_join_salted",
    oracle="""
    SELECT s.s_nationkey AS nationkey,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_qty
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
)
def skew_join_salted(spark, sf_dir):
    """The salted-join operator (operators/skew.py) under an oracle: lineitem
    x supplier through salt-and-replicate, then aggregate per nation. The
    salt is a physical rewrite only — the result must equal the plain join,
    which is exactly what the oracle asserts. For when one suppkey is hot
    enough that even AQE's skew splitting can't save the straggler."""
    from evolution_spark.operators.skew import salted_join

    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", F.round(F.col("l_quantity") * 100).cast("bigint").alias("qty_cents")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    j = salted_join(li, s, on="l_suppkey", n_salts=8)
    return j.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        (F.sum("qty_cents") / 100.0).alias("sum_qty"),
    )


@query(
    "jsonl_roundtrip_documents",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
    FROM documents GROUP BY lang
    """,
)
def jsonl_roundtrip_documents(spark, sf_dir):
    """documents -> JSONL sink -> explicit-schema JSONL source -> aggregate;
    identity-through-roundtrip oracle (any escaping/encoding/type loss in
    the JSONL path breaks the hash). The write is partition-parallel; the
    read is single-pass (schema given, no inference scan)."""
    import os
    import tempfile

    from evolution_spark.io.jsonl import read_jsonl, write_jsonl

    d = table(spark, sf_dir, "documents")
    tmp = os.path.join(tempfile.mkdtemp(prefix="evo_jsonl_"), "documents.jsonl")
    write_jsonl(d, tmp)
    back = read_jsonl(spark, tmp, d.schema)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


@query(
    "kmeans_cluster_summary",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS vi
      FROM embeddings
    ), c0 AS (
      SELECT ROW_NUMBER() OVER (
               ORDER BY ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,8))::BIGINT,
                        vec_id) AS cell_id,
             vi AS cen
      FROM v
      ORDER BY ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,8))::BIGINT, vec_id
      LIMIT 8
    ), d1 AS (
      SELECT v.vec_id, v.vi, c0.cell_id,
             list_sum(list_transform(range(64),
                      i -> (vi[i+1]-cen[i+1])*(vi[i+1]-cen[i+1]))) AS d2
      FROM v CROSS JOIN c0
    ), a1 AS (
      SELECT vec_id, vi, cell_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY d2, cell_id) AS rk FROM d1
      ) WHERE rk = 1
    ), u1 AS (
      SELECT cell_id, dim,
             CAST(ROUND(SUM(val)*1.0/COUNT(*)) AS BIGINT) AS c
      FROM (SELECT cell_id, i.i AS dim, vi[i.i+1] AS val
            FROM a1, (SELECT unnest(range(64)) AS i) i)
      GROUP BY cell_id, dim
    ), c1 AS (
      SELECT cell_id, list(c ORDER BY dim) AS cen FROM u1 GROUP BY cell_id
    ), d2t AS (
      SELECT v.vec_id, c1.cell_id,
             list_sum(list_transform(range(64),
                      i -> (vi[i+1]-cen[i+1])*(vi[i+1]-cen[i+1]))) AS d2
      FROM v CROSS JOIN c1
    ), a2 AS (
      SELECT vec_id, cell_id, d2 FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY d2, cell_id) AS rk FROM d2t
      ) WHERE rk = 1
    )
    SELECT a2.cell_id, COUNT(*) AS n_members,
           CAST(SUM(d2) AS BIGINT) AS inertia,
           MAX(c1.cen[1]) AS c0, MAX(c1.cen[2]) AS c1
    FROM a2 JOIN c1 ON a2.cell_id = c1.cell_id
    GROUP BY a2.cell_id
    """,
)
def kmeans_cluster_summary(spark, sf_dir):
    """One Lloyd iteration of k-means (k=8) over the embeddings on the
    integer grid (operators/ivf.py:kmeans_refine): hash-sampled init ->
    exact integer argmin assignment -> exact-mean centroid update -> final
    assignment. Summary per cell: member count, exact integer inertia, the
    first two centroid coordinates. Bit-exact vs the unrolled DuckDB CTE
    chain because every step is integer arithmetic with one fixed-rounding
    division."""
    from evolution_spark.operators.ivf import kmeans_refine

    e = table(spark, sf_dir, "embeddings")
    assigned, cents = kmeans_refine(e, "vec_id", "embedding", n_cells=8, n_iters=1)
    # __d2 rides along from the assignment argmin (keep_dist_sq) — no
    # rejoin-and-recompute pass; the fold stayed in long arithmetic, so
    # inertia is the oracle's exact integer sum
    summary = assigned.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("__d2").alias("inertia"),
    )
    firsts = cents.select(
        "cell_id",
        F.element_at("centroid", 1).alias("c0"),
        F.element_at("centroid", 2).alias("c1"),
    )
    return summary.join(firsts, "cell_id")


@query(
    "theta_sketch_set_ops",
    oracle="""
    WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
         p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v JOIN p USING (user_id))
             AS users_view_and_purchase_est,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT user_id FROM v UNION SELECT user_id FROM p))
             AS users_view_or_purchase_est
    """,
)
def theta_sketch_set_ops(spark, sf_dir):
    """Theta sketches: the distinct-count algebra HLL cannot do. Per
    event_type theta sketches of user_id support UNION (like HLL) and also
    INTERSECTION — here: users who both viewed AND purchased, estimated
    without ever materializing either user set. Sketches persist/re-merge
    like the HLL rollup (one scan ever).

    The oracle is EXACT set algebra: below the sketch's nominal capacity
    (default lgK=12 -> 4096 retained hashes) a theta sketch never samples
    (theta = 1.0), so union/intersection estimates are exact integers —
    and every test/driver scale here has <= 1500 distinct users. Past
    capacity the estimate would drift from the oracle by design; the
    exact-mode bound is what makes this hash-checkable where HLL (always
    approximate) stays rows-only."""
    e = table(spark, sf_dir, "events")
    sketches = (
        e.where(F.col("event_type").isin("view", "purchase"))
        .groupBy("event_type")
        .agg(F.expr("theta_sketch_agg(user_id)").alias("sk"))
    )
    both = sketches.agg(
        F.expr("theta_sketch_estimate(theta_intersection_agg(sk))")
        .cast("bigint")
        .alias("users_view_and_purchase_est"),
        F.expr("theta_sketch_estimate(theta_union_agg(sk))")
        .cast("bigint")
        .alias("users_view_or_purchase_est"),
    )
    return both
