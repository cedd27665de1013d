"""Interleaved A/B: current _scored_supplier_pairs (4x re-derived distinct
edge subtree) vs a localCheckpoint-shared edge frame. Flip-flop min-of-N."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_cs(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey")
    return l.join(o, l.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))


def score(pairs, deg):
    return (
        pairs.join(
            F.broadcast(deg.select(F.col("s").alias("supp_a"),
                                   F.col("d").alias("da"))), "supp_a")
        .join(
            F.broadcast(deg.select(F.col("s").alias("supp_b"),
                                   F.col("d").alias("db"))), "supp_b")
        .select(
            "supp_a", "supp_b", "shared",
            F.round(F.col("shared")
                    / (F.col("da") + F.col("db") - F.col("shared")), 6)
            .alias("jaccard"))
        .orderBy(F.desc("jaccard"), "supp_a", "supp_b").limit(20)
    )


def current(spark, sf_dir):
    from evolution_spark.operators.graph import project_bipartite
    cs = build_cs(spark, sf_dir)
    pairs = project_bipartite(cs, left="c", right="s").select(
        F.col("a").alias("supp_a"), F.col("b").alias("supp_b"), "shared")
    deg = cs.distinct().groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    return score(pairs, deg)


def candidate(spark, sf_dir):
    from evolution_spark.operators.graph import project_bipartite
    cs = build_cs(spark, sf_dir)
    e = cs.distinct().localCheckpoint()
    pairs = project_bipartite(e, left="c", right="s").select(
        F.col("a").alias("supp_a"), F.col("b").alias("supp_b"), "shared")
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    return score(pairs, deg)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from evolution_spark.session import get_spark

    spark = get_spark(app_name="ab-copurchase", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    a = current(spark, sf_dir)
    b = candidate(spark, sf_dir)
    ra = [tuple(r) for r in a.collect()]
    rb = [tuple(r) for r in b.collect()]
    print("rows equal (must be True):", ra == rb)
    assert ra == rb

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    run(current(spark, sf_dir)); run(candidate(spark, sf_dir))  # warm
    ta, tb = [], []
    for _ in range(5):
        t0 = time.perf_counter(); run(current(spark, sf_dir)); ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(candidate(spark, sf_dir)); tb.append(time.perf_counter() - t0)
    print("current  :", [round(x, 3) for x in ta], "min", round(min(ta), 3))
    print("candidate:", [round(x, 3) for x in tb], "min", round(min(tb), 3))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
