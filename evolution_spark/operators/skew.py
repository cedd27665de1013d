"""Skew-handling utilities: salted aggregation and salted join.

AQE's skew-join splitting (enabled in session.py) handles most runtime skew;
these are the explicit tools for the cases AQE can't fix — aggregations with
a mega-hot key, and broadcast-ineligible joins against a skewed build side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups by (key, salt) — the hot key's rows spread over n_salts
    reducers; phase 2 re-aggregates the per-salt partials. ``aggs`` maps
    output column name -> phase-1 aggregate expression; phase 2 applies the
    matching combiner (sum for sum/count, min/max for min/max).

    Only algebraic aggregates (sum/count/min/max) are supported — that is
    exactly the class that decomposes this way.
    """
    salted = df.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    phase1 = salted.groupBy(*group_cols, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, expr in aggs.items()]
    )

    def combiner(name: str) -> Column:
        # infer the combine step from the phase-1 expression name
        expr_str = str(aggs[name]).lower()
        col = F.col(f"__p_{name}")
        if "min(" in expr_str:
            return F.min(col).alias(name)
        if "max(" in expr_str:
            return F.max(col).alias(name)
        # sum and count both combine by summing partials
        return F.sum(col).alias(name)

    return phase1.groupBy(*group_cols).agg(*[combiner(n) for n in aggs])


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the (large, skewed) left side randomly and
    replicate the right side across all salts — the hot key's rows land on
    n_salts different reducers instead of one straggler.

    Right-side rows are replicated n_salts times: use only when the right
    side is too big to broadcast but small enough to replicate (the regime
    where skew actually hurts)."""
    l_salted = left.withColumn("__salt", (F.rand(seed=11) * n_salts).cast("int"))
    r_replicated = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l_salted.join(r_replicated, [on, "__salt"], how).drop("__salt")
