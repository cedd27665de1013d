"""Distributed 2-D skyline (Pareto frontier) — dominance filtering.

``skyline_2d`` returns the rows not dominated under (minimize ``x``,
maximize ``y``): a row is dominated iff some other row is <= on x and >= on
y with at least one strict. The naive formulation is a quadratic self-join
(NOT EXISTS over the whole table — that IS the DuckDB oracle); the
distributed plan is the classic sort-scan:

1. Reduce to DISTINCT (x, y) pairs (duplicates survive or die together).
2. ``repartitionByRange`` on (x asc, y desc) + ``sortWithinPartitions`` —
   the global sort order under which a pair survives iff its y is STRICTLY
   greater than every preceding pair's y (equal-x pairs sort y-descending,
   so a preceding equal-x row dominates exactly when its y is larger;
   a preceding smaller-x row dominates exactly when its y is >=).
3. Within each partition a running-max window gives the local prefix max;
   across partitions a per-partition max table (one row per partition —
   metadata-sized) turned into prefix carries via one tiny window covers
   rows whose dominator landed in an earlier partition. No partition ever
   sees another partition's rows — only the carry row crosses.
4. Survivors semi-join back to the full-width input, so payload columns
   never enter the sort shuffle.

Total cost: one narrow shuffle of the (x, y) pairs + one semi-join —
O(n log n) work and O(n) traffic vs the oracle's O(n^2), and no single-task
bottleneck (the anti-pattern would be one global Window.orderBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skyline_2d(
    df: DataFrame,
    x: str,
    y: str,
    n_partitions: int | None = None,
    cut_lineage: bool = True,
) -> DataFrame:
    """Rows of ``df`` on the Pareto frontier minimizing ``x``, maximizing
    ``y``. Null x/y rows are excluded (dominance is undefined on null)."""
    spark = df.sparkSession
    n = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    clean = df.where(F.col(x).isNotNull() & F.col(y).isNotNull())
    pairs = clean.select(x, y).distinct()
    parted = pairs.repartitionByRange(
        n, F.col(x).asc(), F.col(y).desc()
    ).sortWithinPartitions(F.col(x).asc(), F.col(y).desc())
    # materialized once: the per-partition max branch and the carry join
    # branch must observe the SAME partitioning (re-executing the range
    # exchange per branch can coalesce differently under AQE)
    stamped = parted.withColumn("__pid", F.spark_partition_id())
    if cut_lineage:
        stamped = stamped.localCheckpoint()

    # per-partition y-max -> prefix carry for every LATER partition
    pmax = stamped.groupBy("__pid").agg(F.max(y).alias("__pmax"))
    w_carry = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    carries = pmax.select(
        "__pid", F.max("__pmax").over(w_carry).alias("__carry")
    )

    w_local = (
        Window.partitionBy("__pid")
        .orderBy(F.col(x).asc(), F.col(y).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_max = F.max(y).over(w_local)
    # comparisons stay in y's NATIVE type (no double cast — a bigint y
    # above 2^53 would collide with its neighbor after the cast and drop a
    # frontier row); greatest() skips nulls, and a null best means "no
    # preceding pair anywhere" — first in the global order, always survives
    best_before = F.greatest(local_max, F.col("__carry"))
    survivors = (
        stamped.join(F.broadcast(carries), "__pid")
        .withColumn("__best_before", best_before)
        .where(F.col("__best_before").isNull() | (F.col(y) > F.col("__best_before")))
        .select(x, y)
    )
    return clean.join(survivors, [x, y], "left_semi")
