"""IVF ANN, skew utilities, and time-rollup operator tests."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_ivf_cells_cover_corpus(spark, emb):
    from evolution_spark.operators.ivf import assign_cells, sample_centroids

    cents = sample_centroids(emb, "vec_id", "embedding", 8)
    assert cents.count() == 8
    assigned = assign_cells(emb, cents, "vec_id", "embedding")
    assert assigned.count() == emb.count()  # every vector lands in a cell
    cells = assigned.groupBy("cell_id").count().collect()
    assert len(cells) >= 2  # centroids actually partition the space


def test_ivf_topk_finds_planted_neighbor(spark, emb):
    from evolution_spark.operators.ivf import ivf_topk

    # plant a near-identical copy of vec 0
    planted = emb.unionByName(
        emb.where(F.col("vec_id") == 0).select(
            F.lit(999999).alias("vec_id"),
            F.transform("embedding", lambda x: x * F.lit(1.000001)).alias("embedding"),
            F.col("label"),
        )
    )
    probes = planted.where(F.col("vec_id") == 0)
    top = ivf_topk(planted, probes, "vec_id", "embedding", k=3, n_cells=8, nprobe=2)
    rows = top.collect()
    assert rows and rows[0].neighbor_id == 999999  # near-copy shares the cell
    assert rows[0].cos_sim > 0.999999


def test_ivf_recall_vs_bruteforce(spark, emb):
    from evolution_spark.operators.ivf import ivf_topk
    from evolution_spark.operators.similarity import cosine_topk

    probes = emb.where(F.col("vec_id") < 5)
    exact = cosine_topk(emb, probes, "vec_id", "embedding", k=10)
    approx = ivf_topk(emb, probes, "vec_id", "embedding", k=10, n_cells=8, nprobe=4)
    e = {(r.probe_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.probe_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.3  # nprobe=4 of 8 cells on random data


def test_salted_agg_matches_plain(spark):
    from evolution_spark.operators.skew import salted_agg

    l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    plain = {
        (r.l_returnflag,): (r.n, r.q, r.mn, r.mx)
        for r in l.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_quantity")).cast("bigint")).alias("q"),
            F.min("l_partkey").alias("mn"),
            F.max("l_partkey").alias("mx"),
        ).collect()
    }
    salted = {
        (r.l_returnflag,): (r.n, r.q, r.mn, r.mx)
        for r in salted_agg(
            l,
            ["l_returnflag"],
            {
                "n": F.count(F.lit(1)),
                "q": F.sum(F.round(F.col("l_quantity")).cast("bigint")),
                "mn": F.min("l_partkey"),
                "mx": F.max("l_partkey"),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    from evolution_spark.operators.skew import salted_join

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = o.join(c, "o_custkey").count()
    salted = salted_join(o, c, "o_custkey", n_salts=4).count()
    assert salted == plain


def test_time_rollup_consistency(spark):
    from evolution_spark.operators.rollup import time_rollup, write_rollup

    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 5), "a", 1.0),
        (2, dt.datetime(2024, 1, 1, 10, 55), "a", 2.0),
        (3, dt.datetime(2024, 1, 1, 11, 5), "a", 4.0),
        (4, dt.datetime(2024, 1, 2, 0, 0), "b", 8.0),
    ]
    df = spark.createDataFrame(rows, ["id", "ts", "k", "v"])
    rolled = time_rollup(
        df, "ts", ["hour", "day"],
        aggs={"n": F.count(F.lit(1)), "s": F.sum("v")}, keys=["k"],
    )
    out = {
        (r.granularity, r.bucket_start.isoformat(), r.k): (r.n, r.s)
        for r in rolled.collect()
    }
    assert out[("hour", "2024-01-01T10:00:00", "a")] == (2, 3.0)
    assert out[("hour", "2024-01-01T11:00:00", "a")] == (1, 4.0)
    assert out[("day", "2024-01-01T00:00:00", "a")] == (3, 7.0)
    assert out[("day", "2024-01-02T00:00:00", "b")] == (1, 8.0)
    # day level == sum of its hour level (cross-granularity consistency)
    hours = sum(v[1] for (g, b, k), v in out.items() if g == "hour" and k == "a")
    assert hours == out[("day", "2024-01-01T00:00:00", "a")][1]


def test_write_rollup_partitioned(spark, tmp_path):
    from evolution_spark.operators.rollup import time_rollup, write_rollup

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10, 5), 1.0)], ["id", "ts", "v"]
    )
    rolled = time_rollup(df, "ts", ["hour", "day"], aggs={"n": F.count(F.lit(1))})
    path = str(tmp_path / "rollup")
    write_rollup(rolled, path)
    import os
    assert sorted(
        d for d in os.listdir(path) if d.startswith("granularity=")
    ) == ["granularity=day", "granularity=hour"]
    # partition pruning: reading one granularity scans only its partition
    day = spark.read.parquet(path).where(F.col("granularity") == "day")
    assert day.count() == 1


def test_udtf_chunker_agrees_with_jvm_path(spark):
    """The Python UDTF chunker and the JVM-side array-expression chunker
    must enumerate identical chunks (same starts, same tails)."""
    from pyspark.sql import functions as F

    from evolution_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
         (2, "one two three"),
         (3, " ".join(f"w{i}" for i in range(80)))],
        "doc_id: long, text: string",
    )
    docs.createOrReplaceTempView("udtf_docs")
    via_udtf = spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.n_tokens, md5(c.chunk_text) AS h "
        "FROM udtf_docs d, LATERAL chunk_text(text, 32, 8) c"
    ).collect()
    step = 24
    w = F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
    ex = docs.select("doc_id", w.alias("w")).select(
        "doc_id", "w",
        F.explode(F.sequence(F.lit(0), F.floor((F.size("w") - 1) / step).cast("int"))).alias("chunk_idx"),
    )
    chunk = F.slice("w", F.col("chunk_idx") * step + 1, 32)
    via_jvm = ex.select(
        "doc_id", "chunk_idx", F.size(chunk).alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("h"),
    ).collect()
    key = lambda r: (r.doc_id, r.chunk_idx, r.n_tokens, r.h)  # noqa: E731
    assert sorted(map(key, via_udtf)) == sorted(map(key, via_jvm))


def test_udtf_kv_parser(spark):
    from evolution_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    out = spark.sql(
        "SELECT p.key, p.value FROM VALUES ('a=1;b=2;c = 3') t(s), "
        "LATERAL parse_kv_pairs(s) p"
    ).collect()
    assert sorted((r.key, r.value) for r in out) == [("a", "1"), ("b", "2"), ("c", "3")]


def test_theta_sketch_set_ops_match_exact(spark):
    """At test-SF cardinalities theta sketches run in exact mode: the
    intersection/union estimates must equal the true distinct counts."""
    import pyspark.sql.functions as F

    from evolution_spark.queries import QUERIES
    from evolution_spark.queries.base import table

    sf = "/root/testdata/sf0.001"
    est = QUERIES["theta_sketch_set_ops"](spark, sf).first()
    e = table(spark, sf, "events")
    viewers = {r.user_id for r in e.where("event_type = 'view'").select("user_id").distinct().collect()}
    buyers = {r.user_id for r in e.where("event_type = 'purchase'").select("user_id").distinct().collect()}
    assert round(est.users_view_and_purchase_est) == len(viewers & buyers)
    assert round(est.users_view_or_purchase_est) == len(viewers | buyers)


def test_count_min_sketch_binary_is_mergeable_and_bounded(spark):
    """Spark's count_min_sketch aggregate yields a binary sketch the JVM
    CountMinSketch class reads back: merged day-sketches never undercount
    and overcount by at most eps*N — the mergeable heavy-hitter contract
    (persist per-partition sketches, re-merge in O(sketch))."""
    import pyspark.sql.functions as F

    from evolution_spark.queries.base import table

    e = table(spark, "/root/testdata/sf0.001", "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").alias("cms")
    )
    rows = daily.collect()
    jvm = spark.sparkContext._jvm
    merged = None
    for r in rows:
        bb = jvm.java.io.ByteArrayInputStream(bytes(r.cms))
        sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bb)
        merged = sk if merged is None else merged.mergeInPlace(sk)
    exact = {r.event_type: r.cnt for r in
             e.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    total = sum(exact.values())
    for t, n in exact.items():
        est = merged.estimateCount(t)
        assert est >= n                      # CMS never undercounts
        assert est <= n + 0.001 * total + 1  # eps * N bound
