"""Temporal join operators Spark lacks as built-ins: as-of join and
range (interval) join — composed from DataFrame primitives, no UDFs.

Scale design:
* ``asof_join`` — the union + forward-fill formulation: one shuffle of both
  sides on the ``by`` key, one window pass; never a per-row subquery or a
  nested-loop join. This is the standard distributed as-of (used for quote/
  trade alignment at billions of rows).
* ``range_join`` — equi-join on overlapping time *bins* + exact refinement:
  turns the quadratic interval problem into an equi-shuffle whose fan-out is
  bounded by interval_length/bin_width. A broadcast nested-loop join (Spark's
  default for non-equi) would not survive two large sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | None = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` (direction='backward'; 'forward' attaches the
    next ``right.on >= left.on``), optionally matching a ``by`` key.

    Implementation: tag both sides, union on (by, on), sort within the
    window, forward-fill (or backward-fill) the right columns with
    ``last(ignoreNulls)``, keep left rows. One shuffle + one window pass.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    right_cols = [c for c in right.columns if c != on and c != by]
    out_names = {c: (c + suffix if c in left.columns else c) for c in right_cols}

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    key_cols = [F.col(on)] + ([F.col(by)] if by else [])
    r_tagged = right.select(
        *key_cols,
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    # align schemas: left columns missing on the right become typed nulls
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r_tagged = r_tagged.select(*l_tagged.columns)

    unioned = l_tagged.unionByName(r_tagged)

    part = [by] if by else []
    if direction == "backward":
        # right rows sort BEFORE left rows at the same timestamp so an exact
        # tie matches (right.on <= left.on)
        w = (
            Window.partitionBy(*part)
            .orderBy(F.col(on).asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = unioned.select(
            *[F.col(c) for c in unioned.columns if not c.startswith("__r_")],
            *[
                F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
                for c in right_cols
            ],
        )
    else:
        w = (
            Window.partitionBy(*part)
            .orderBy(F.col(on).asc(), F.col("__is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        filled = unioned.select(
            *[F.col(c) for c in unioned.columns if not c.startswith("__r_")],
            *[
                F.first(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
                for c in right_cols
            ],
        )
    return filled.where(F.col("__is_left") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__f_{c}").alias(out_names[c]) for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bin_width_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join left points into right [start, end) intervals via time-binning.

    Both sides explode/assign to fixed-width bins; the join is an equi-join
    on the bin plus the exact containment refinement. Right intervals
    spanning k bins produce k join keys — fan-out is interval/bin_width, so
    pick bin_width near the typical interval length.
    """
    bin_l = F.floor(F.col(left_point).cast("timestamp").cast("long") / bin_width_seconds)
    l_binned = left.withColumn("__bin", bin_l)

    start_bin = F.floor(F.col(right_start).cast("timestamp").cast("long") / bin_width_seconds)
    end_bin = F.floor(
        (F.col(right_end).cast("timestamp").cast("long") - F.lit(1)) / bin_width_seconds
    )
    r_binned = right.withColumn(
        "__bin", F.explode(F.sequence(start_bin, F.greatest(end_bin, start_bin)))
    )
    joined = l_binned.join(r_binned, "__bin", how).where(
        (F.col(left_point) >= F.col(right_start)) & (F.col(left_point) < F.col(right_end))
    )
    return joined.drop("__bin")
