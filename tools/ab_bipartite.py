"""Interleaved A/B: project_bipartite self-join (current) vs
collect_set + in-row pair explode (candidate). Flip-flop min-of-N in ONE
session so ambient host noise hits both variants equally."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def current(cs):
    from evolution_spark.operators.graph import project_bipartite
    return project_bipartite(cs, left="c", right="s")


def candidate(cs, max_left_degree=None):
    e = cs.select(F.col("c").alias("l"), F.col("s").alias("r"))
    n = e.sparkSession.sparkContext.defaultParallelism
    sets_df = (
        e.repartition(n, "l")
        .groupBy("l")
        .agg(F.sort_array(F.collect_set("r")).alias("rs"))
    )
    if max_left_degree is not None:
        sets_df = sets_df.where(F.size("rs") <= max_left_degree)
    rs = F.col("rs")
    pair_structs = F.flatten(
        F.transform(
            rs,
            lambda x, i: F.transform(
                F.slice(rs, i + F.lit(2), F.size(rs)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        sets_df.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from evolution_spark.session import get_spark

    spark = get_spark(app_name="ab-bipartite", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey")
    cs = l.join(o, l.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))

    # equivalence check first
    a = current(cs)
    b = candidate(cs)
    diff = a.exceptAll(b).union(b.exceptAll(a)).count()
    print("row diff (must be 0):", diff)
    assert diff == 0

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    run(a); run(b)  # warm both
    ta, tb = [], []
    for i in range(5):
        t0 = time.perf_counter(); run(current(cs)); ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(candidate(cs)); tb.append(time.perf_counter() - t0)
    print("current  :", [round(x, 3) for x in ta], "min", round(min(ta), 3))
    print("candidate:", [round(x, 3) for x in tb], "min", round(min(tb), 3))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
