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
from pyspark.sql.types import DateType, StructField, StructType, TimestampNTZType
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    tolerance: float | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` (direction='backward'; 'forward' attaches the
    next ``right.on >= left.on``), optionally matching a ``by`` key.

    Implementation: tag both sides, union on (by, on), sort within the
    window, forward-fill (or backward-fill), keep left rows. One shuffle +
    one window pass.

    All right columns are packed into ONE struct before the fill: the struct
    is non-null for every right row even when individual fields are null, so
    (a) a matched right row's genuine NULLs survive as NULLs instead of being
    replaced by stale earlier values, and (b) all output columns always come
    from the SAME right row (per-column ``last(ignorenulls)`` could stitch
    values from different rows). Ties among right rows at the same (by, on)
    are broken deterministically by a hash of the packed payload, so repeated
    runs pick the same row.

    ``by=None`` runs fully distributed — NOT a single global window: the
    union range-repartitions on the sort key (balanced sampled boundaries,
    the ``operators/rank.py`` machinery), each partition forward-fills
    locally, and a per-partition boundary carry (one payload row per
    partition, filled across partitions with an O(n_partitions) window and
    broadcast back) resolves left rows whose match lives in an earlier
    (later, for ``forward``) partition. Partition-invariance is property-
    tested: boundaries decide WHERE a row is filled, never WHAT it matches.

    ``tolerance`` (pandas ``merge_asof(tolerance=...)`` parity): a match
    further than ``tolerance`` from the left timestamp (one-sided, in the
    join direction) is discarded — the left row keeps NULL right columns.
    Compared on ``on`` cast to double, so timestamps use SECONDS.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    right_cols = [c for c in right.columns if c != on and c != by]
    out_names = {c: (c + suffix if c in left.columns else c) for c in right_cols}
    payload_type = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in right_cols]
        + [StructField("__on", right.schema[on].dataType, True)]
    )

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(payload_type).alias("__r"),
        F.lit(None).cast("bigint").alias("__seq"),
    )
    payload = F.struct(
        *[F.col(c).alias(c) for c in right_cols], F.col(on).alias("__on")
    )
    key_cols = [F.col(on)] + ([F.col(by)] if by else [])
    r_tagged = right.select(
        *key_cols,
        F.lit(0).alias("__is_left"),
        payload.alias("__r"),
        F.xxhash64(*[F.col(c) for c in right_cols]).alias("__seq"),
    )
    # align schemas: left columns missing on the right become typed nulls
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r_tagged = r_tagged.select(*l_tagged.columns)

    unioned = l_tagged.unionByName(r_tagged)

    back = direction == "backward"
    # __flag sorts the matchable side first at an exact timestamp tie:
    # right-first for backward (right.on <= left.on), left-first for forward
    flag = (
        F.col("__is_left") if back else (F.lit(1) - F.col("__is_left"))
    ).alias("__flag")
    unioned = unioned.select("*", flag)
    out_cols = [c for c in unioned.columns if c not in ("__r", "__seq", "__flag")]

    if by is not None:
        w = Window.partitionBy(by).orderBy(
            F.col(on).asc(), F.col("__flag").asc(), F.col("__seq").asc()
        )
        if back:
            fill = F.last("__r", ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        else:
            fill = F.first("__r", ignorenulls=True).over(
                w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
            )
        filled = unioned.select(*[F.col(c) for c in out_cols], fill.alias("__f"))
    else:
        filled = _global_asof_fill(unioned, on, back, out_cols)
    match = F.col("__f")
    if tolerance is not None:
        # timestamp_ntz/date have no direct numeric cast; route via timestamp
        # (epoch seconds — the same session-tz shift applies to both sides,
        # so the difference is unaffected)
        def _secs(c, dtype):
            if isinstance(dtype, (DateType, TimestampNTZType)):
                c = c.cast("timestamp")
            return c.cast("double")

        gap = F.abs(
            _secs(F.col(on), left.schema[on].dataType)
            - _secs(match.getField("__on"), right.schema[on].dataType)
        )
        match = F.when(gap <= F.lit(float(tolerance)), match)
    return filled.where(F.col("__is_left") == 1).select(
        *[F.col(c) for c in left.columns],
        *[match.getField(c).alias(out_names[c]) for c in right_cols],
    )


def _global_asof_fill(
    unioned: DataFrame, on: str, back: bool, out_cols: list[str]
) -> DataFrame:
    """Distributed fill for ``asof_join(by=None)``: the global-sort twin of
    ``operators/rank.py``'s range-repartition + offsets machinery.

    1. ``repartitionByRange`` on the full sort key (on, __flag, __seq) —
       sampled boundaries give balanced partitions whose key ranges tile
       the global order; ``spark_partition_id`` is the partition's rank.
    2. One window PER PARTITION (partitionBy the pid — parallel, never a
       single global partition) computes the within-partition fill.
    3. The boundary carry: each partition's last (first, for forward)
       right payload — ONE row per partition — is filled across the tiny
       pid table with an O(n_partitions) window, then broadcast back;
       rows whose local fill is null take the carried payload.

    Every exchange moves the data once; nothing funnels through one task
    except the n_partitions-row carry table."""
    spark = unioned.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parted = unioned.repartitionByRange(
        n, F.col(on).asc(), F.col("__flag").asc(), F.col("__seq").asc()
    )
    stamped = parted.select("*", F.spark_partition_id().alias("__pid"))

    # one payload row per partition (right rows only); empty partitions and
    # all-left partitions surface as NULL carries via the left join
    order_key = F.struct(F.col(on), F.col("__seq"))
    carry_agg = (
        F.max_by("__r", order_key) if back else F.min_by("__r", order_key)
    ).alias("__carry")
    pids = stamped.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt")).drop("__cnt")
    carries = stamped.where(F.col("__is_left") == 0).groupBy("__pid").agg(carry_agg)
    ctab = pids.join(carries, "__pid", "left")
    if back:
        w_c = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
        carry_in = F.last("__carry", ignorenulls=True).over(w_c)
    else:
        w_c = Window.orderBy("__pid").rowsBetween(1, Window.unboundedFollowing)
        carry_in = F.first("__carry", ignorenulls=True).over(w_c)
    ctab = ctab.select("__pid", carry_in.alias("__carry_in"))

    w = Window.partitionBy("__pid").orderBy(
        F.col(on).asc(), F.col("__flag").asc(), F.col("__seq").asc()
    )
    if back:
        local = F.last("__r", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        local = F.first("__r", ignorenulls=True).over(
            w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
    return stamped.join(F.broadcast(ctab), "__pid").select(
        *[F.col(c) for c in out_cols],
        F.coalesce(local, F.col("__carry_in")).alias("__f"),
    )


def scd2_from_changelog(
    df: DataFrame,
    key: str,
    order_col: str,
    attr_cols: list[str],
    tiebreak: str | list[str] | None = None,
) -> DataFrame:
    """Build SCD-type-2 validity intervals from an append-only changelog.

    For each ``key``, order events by ``order_col`` (plus ``tiebreak`` — a
    column or list of columns — for determinism on timestamp ties), drop
    consecutive rows whose ``attr_cols``
    are unchanged (no-op updates), and emit one row per attribute regime:
    ``valid_from`` = the change's timestamp, ``valid_to`` = the next change's
    timestamp (NULL while current), ``is_current``.

    Scale: one shuffle on ``key`` + two window passes over the same
    partitioning (Catalyst reuses the sort); no self-join. Change detection
    compares a struct of the attributes against its lag — NULL-safe via
    eqNullSafe, so NULL->value and value->NULL transitions are real changes.
    """
    ties = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])
    order = [F.col(order_col).asc()] + [F.col(t).asc() for t in ties]
    w = Window.partitionBy(key).orderBy(*order)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    changed = ~attrs.eqNullSafe(F.lag(attrs, 1).over(w))
    changes = df.withColumn("__chg", changed).where("__chg")
    w2 = Window.partitionBy(key).orderBy(*order)
    return changes.select(
        F.col(key),
        *[F.col(c) for c in attr_cols],
        F.col(order_col).alias("valid_from"),
        F.lead(order_col, 1).over(w2).alias("valid_to"),
        F.lead(order_col, 1).over(w2).isNull().alias("is_current"),
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


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_minutes: int = 30,
    tiebreak: str | None = None,
    out_col: str = "session_id",
) -> DataFrame:
    """Gaps-and-islands sessionization: number each ``key``'s events into
    sessions split by inactivity longer than ``gap_minutes``.

    One shuffle on ``key``, two window functions over one sort (lag marks
    session starts, running sum numbers them) — the scalable batch
    sessionizer; the streaming twin is ``session_window`` with a watermark
    (streaming/events.py). Gap comparison is microsecond-exact and NTZ-safe
    (``micros_since_epoch``; a seconds cast would disagree with engines
    comparing at full timestamp precision)."""
    from evolution_spark.functions.time import micros_since_epoch

    order = [F.col(ts_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w_order = Window.partitionBy(key).orderBy(*order)
    us = micros_since_epoch(df, ts_col)
    marked = df.withColumn(
        "__new_session",
        F.when(
            us - F.lag(us).over(w_order) > gap_minutes * 60 * 1_000_000,
            1,
        ).otherwise(0),
    )
    w_run = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return marked.withColumn(out_col, F.sum("__new_session").over(w_run)).drop(
        "__new_session"
    )
