"""Time-series rollup (hypertable-style continuous aggregate): one pass over
an event stream/table producing aggregates at multiple time granularities,
ready to be written partitioned by (granularity, bucket).

Scale design: a single explode over the granularity list multiplies rows by
len(granularities) (small constant), then ONE shuffle on
(granularity, bucket, *keys) aggregates every level simultaneously —
vs. one scan+shuffle per level for naive per-granularity jobs. The output
partitions naturally by granularity for pruned reads.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRANULARITIES = ("minute", "hour", "day", "week", "month")


def time_rollup(
    df: DataFrame,
    ts_col: str,
    granularities: Sequence[str],
    aggs: dict[str, Column],
    keys: Sequence[str] = (),
) -> DataFrame:
    """Aggregate ``df`` at each granularity in one shuffle.

    Returns columns: granularity, bucket_start (timestamp), *keys, *aggs.
    """
    for g in granularities:
        if g not in GRANULARITIES:
            raise ValueError(f"unknown granularity {g!r} (expected {GRANULARITIES})")
    exploded = df.withColumn(
        "granularity", F.explode(F.array(*[F.lit(g) for g in granularities]))
    ).withColumn(
        "bucket_start",
        F.coalesce(
            *[
                F.when(F.col("granularity") == g, F.date_trunc(g, F.col(ts_col)))
                for g in granularities
            ]
        ),
    )
    return exploded.groupBy("granularity", "bucket_start", *keys).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )


def write_rollup(rollup: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Materialize the rollup partitioned by granularity — readers of one
    level scan only its partition (partition pruning)."""
    rollup.write.mode(mode).partitionBy("granularity").parquet(path)
