"""Distributed global ranking — the scalable replacement for
``Window.orderBy(...)`` with no partition key, which funnels the entire
dataset through ONE task (the single-partition-window anti-pattern).

``with_global_rank`` computes the exact global rank of every row in a fully
distributed plan:

1. ``repartitionByRange`` on the order keys (Spark samples boundaries —
   balanced output partitions) + ``sortWithinPartitions``.
2. ``monotonically_increasing_id`` stamps each row with
   ``partition_id * 2^33 + local_index`` — after the range sort the local
   index IS the within-partition rank, with no extra window pass or
   shuffle.
3. Per-partition row counts (tiny: one row per partition) turn into prefix
   offsets with one driver-free window over the counts table; a broadcast
   join adds each partition's offset to its local index.

Global rank = offset + local index + 1. The rank values are independent of
where the sampled range boundaries land: boundaries only decide WHICH task
computes a row's rank, never the rank itself, so the result is
deterministic for unique order keys.

From the exact rank (and the broadcast global count) every global
order-statistic window function is closed-form: percent_rank, cume_dist
(unique keys), and ntile with SQL's first-buckets-bigger fill.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PARTITION_ID_SHIFT = 33  # monotonically_increasing_id() = pid * 2^33 + idx


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    n_partitions: int | None = None,
    cut_lineage: bool = True,
) -> DataFrame:
    """Append the exact 1-based global rank under ``order_cols`` (which must
    uniquely order rows — add a tiebreak column if they don't; with
    duplicate keys the rank among equals is partition-placement-arbitrary).
    """
    n = n_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    parted = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    mid = parted.withColumn("__mid", F.monotonically_increasing_id())
    pid = F.shiftrightunsigned("__mid", _PARTITION_ID_SHIFT)
    idx = F.col("__mid").bitwiseAND(F.lit((1 << _PARTITION_ID_SHIFT) - 1))
    # materialized ONCE: the per-partition counts branch and the data join
    # branch below both consume this frame — without the cut each branch
    # re-executes the range exchange, and AQE may coalesce the two
    # executions into DIFFERENT partitionings (observed when exchange
    # reuse is unavailable, e.g. over checkpointed inputs), attributing
    # offsets to the wrong partition ids and corrupting ranks
    stamped = mid.select("*", pid.alias("__pid"), idx.alias("__idx")).drop("__mid")
    if cut_lineage:
        stamped = stamped.localCheckpoint()

    counts = stamped.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off")
    )
    # offsets has exactly n rows — the single-partition window above and the
    # broadcast below cost O(n_partitions), never O(rows)
    return (
        stamped.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__off") + F.col("__idx") + 1))
        .drop("__pid", "__idx", "__off")
    )


def ntile_from_rank(rank: Column, n_rows: Column, k: int) -> Column:
    """SQL NTILE(k) from a precomputed global rank: the first ``n mod k``
    buckets get ``ceil(n/k)`` rows, the rest ``floor(n/k)`` (first-buckets-
    bigger, exactly Spark's/DuckDB's semantics)."""
    q = F.floor(n_rows / k)
    rem = n_rows % k
    big = (q + 1) * rem  # rows covered by the bigger buckets
    return F.when(
        rank <= big, F.floor((rank - 1) / (q + 1)) + 1
    ).otherwise(rem + F.floor((rank - 1 - big) / q) + 1).cast("int")


def grouped_exact_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    percentages: list[float],
    n_partitions: int | None = None,
) -> DataFrame:
    """Exact interpolated percentiles per group WITHOUT buffering any
    group's values in one task — the distributed replacement for
    ``F.percentile(value_col, array(...))``, whose aggregation buffer
    holds every (value, count) pair of a group in a single reducer (the
    §5 memory shape that breaks on a 100 TB group).

    Returns one row per (group, percentage): ``(*group_cols, __p,
    __value)``, where ``__value`` is BIT-IDENTICAL to Spark's
    ``Percentile`` expression. That expression computes (Percentile.scala,
    ``generateOutput``/``getPercentile``):

        position = (count - 1) * percentage            // Long * Double
        lower    = floor(position); higher = ceil(position)
        if lower == higher:          sorted(lower)
        elif key(higher)==key(lower): key(lower)       // skip interpolation
        else: (higher - position) * key(lower) + (position - lower) * key(higher)

    replicated here term-for-term in Spark SQL double arithmetic (same
    IEEE ops in the same order — the equal-key shortcut matters because
    ``a*k + b*k`` with a+b==1 is NOT exactly ``k`` in floating point).
    The sorted-position lookup runs on the exact distributed global rank
    (``with_global_rank``: range exchange + per-partition offsets);
    duplicate values make the rank among equals placement-arbitrary, but
    the VALUE at any rank is the multiset order statistic — deterministic
    regardless of tie placement, so the percentile is too.

    Matches ``F.percentile`` null semantics (null values ignored, count
    excludes them). Groups whose values are ALL null are absent from the
    output (callers needing them re-attach with a left join); Spark's
    aggregate would return NULL for such groups.
    """
    vals = df.select(*group_cols, value_col).where(F.col(value_col).isNotNull())
    ranked = with_global_rank(
        vals, [*group_cols, value_col], rank_col="__r",
        n_partitions=n_partitions,
    )
    # per-group [min rank, count]: one map-side-combined aggregation, one
    # row per group — metadata-sized
    bounds = ranked.groupBy(*group_cols).agg(
        F.min("__r").alias("__r0"), F.count(F.lit(1)).alias("__n")
    )
    needed = (
        bounds.select(
            *group_cols, "__r0",
            F.explode(
                F.array(*[F.lit(float(p)) for p in percentages])
            ).alias("__p"),
            "__n",
        )
        # (count - 1) * percentage exactly as Percentile.generateOutput
        # (bigint - 1) * double promotes to double: one IEEE multiply
        .withColumn("__pos", (F.col("__n") - F.lit(1)) * F.col("__p"))
        .withColumn("__lo", F.floor("__pos"))
        .withColumn("__hi", F.ceil("__pos"))
    )
    # the two global ranks each (group, p) needs, as an equi-joinable
    # (rank -> role) list: 2 rows per (group, percentage) — tiny, broadcast
    marks = needed.select(
        *group_cols, "__p", "__pos", "__lo", "__hi",
        F.explode(
            F.array(
                F.struct(
                    (F.col("__r0") + F.col("__lo")).alias("__r"),
                    F.lit("lo").alias("__which"),
                ),
                F.struct(
                    (F.col("__r0") + F.col("__hi")).alias("__r"),
                    F.lit("hi").alias("__which"),
                ),
            )
        ).alias("__m"),
    ).select(
        *group_cols, "__p", "__pos", "__lo", "__hi",
        F.col("__m.__r").alias("__r"), F.col("__m.__which").alias("__which"),
    )
    hits = ranked.select("__r", F.col(value_col).alias("__v")).join(
        F.broadcast(marks), "__r"
    )
    per = hits.groupBy(*group_cols, "__p", "__pos", "__lo", "__hi").agg(
        F.max(F.when(F.col("__which") == "lo", F.col("__v"))).alias("__vlo"),
        F.max(F.when(F.col("__which") == "hi", F.col("__v"))).alias("__vhi"),
    )
    vlo = F.col("__vlo").cast("double")
    vhi = F.col("__vhi").cast("double")
    interp = (F.col("__hi") - F.col("__pos")) * vlo + (
        F.col("__pos") - F.col("__lo")
    ) * vhi
    value = (
        F.when(F.col("__lo") == F.col("__hi"), vlo)
        .when(vhi == vlo, vlo)
        .otherwise(interp)
    )
    return per.select(*group_cols, "__p", value.alias("__value"))


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running",
    n_partitions: int | None = None,
    cut_lineage: bool = True,
) -> DataFrame:
    """Exact cumulative sum of ``value_col`` under the GLOBAL ordering of
    ``order_cols`` — without the single-task ``Window.orderBy`` that a
    naive global running sum funnels everything through.

    Same distributed shape as ``with_global_rank``: range-repartition on
    the order keys, a per-partition running sum (windows partition by the
    physical partition id), then per-partition totals (one row per
    partition — metadata-sized) turned into prefix carries by one tiny
    window and broadcast back. Rows with EQUAL order keys may receive
    their intra-tie cumulative values in an arbitrary order (exactly like
    any SQL ROWS-frame running sum); any aggregate that is tie-order
    invariant — the sum after a tie group, a per-group max across a
    monotone run — is deterministic."""
    spark = df.sparkSession
    n = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    parted = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    # materialized once for the same two-branch reason as with_global_rank
    # above: totals and the local-cumsum join must see ONE partitioning
    stamped = parted.withColumn("__pid", F.spark_partition_id())
    if cut_lineage:
        stamped = stamped.localCheckpoint()
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = stamped.withColumn("__loc", F.sum(value_col).over(w_local))
    totals = stamped.groupBy("__pid").agg(F.sum(value_col).alias("__tot"))
    w_carry = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    carries = totals.select(
        "__pid", F.sum("__tot").over(w_carry).alias("__carry")
    )
    return (
        local.join(F.broadcast(carries), "__pid")
        .withColumn(out_col, F.col("__loc") + F.coalesce("__carry", F.lit(0)))
        .drop("__pid", "__loc", "__carry")
    )


def global_running_sum_with_rank(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running",
    rank_col: str = "rank",
    n_partitions: int | None = None,
    cut_lineage: bool = True,
) -> DataFrame:
    """Fused ``global_running_sum`` + ``with_global_rank`` over the SAME
    total order (r15): one range exchange, one lineage cut, one
    per-partition window producing cumsum AND row number together, and one
    metadata-sized carry pass feeding BOTH the value prefix and the
    row-count prefix. Stacking the two standalone operators costs two
    range exchanges and two checkpoints of the full frame for what is one
    physical layout — measured on revenue_concentration (sf0.1): build
    phase 12 jobs -> 6. Tie handling matches the standalone ops: equal
    order keys receive intra-tie cum/rank values in partition-placement
    order (callers needing determinism add a tiebreak column, exactly as
    before)."""
    spark = df.sparkSession
    n = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    parted = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    stamped = parted.withColumn("__pid", F.spark_partition_id())
    if cut_lineage:
        stamped = stamped.localCheckpoint()
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = stamped.withColumn("__loc", F.sum(value_col).over(w_local)).withColumn(
        "__rn", F.count(F.lit(1)).over(w_local)
    )
    totals = stamped.groupBy("__pid").agg(
        F.sum(value_col).alias("__tot"), F.count(F.lit(1)).alias("__cnt")
    )
    w_carry = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    carries = totals.select(
        "__pid",
        F.sum("__tot").over(w_carry).alias("__carry"),
        F.coalesce(F.sum("__cnt").over(w_carry), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(carries), "__pid")
        .withColumn(out_col, F.col("__loc") + F.coalesce("__carry", F.lit(0)))
        .withColumn(rank_col, F.col("__off") + F.col("__rn"))
        .drop("__pid", "__loc", "__rn", "__carry", "__off")
    )
