"""Streaming sinks beyond the built-ins: idempotent (exactly-once) parquet
output via ``foreachBatch``.

Spark's file sinks are exactly-once only through their own commit log;
``foreachBatch`` hands you at-least-once micro-batches (a batch can be
re-delivered after a restart from the same checkpoint). The sink here makes
re-delivery harmless by writing each micro-batch to a batch-id-derived
directory with overwrite semantics: replaying batch N overwrites batch N's
own output, never duplicating it — the standard idempotent-by-construction
pattern that also works against stores with no transactional commit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def idempotent_parquet_sink(out_dir: str):
    """Return a ``foreachBatch`` function writing each micro-batch to
    ``out_dir/batch_id=N`` with overwrite. Replays of a batch after a
    checkpoint restart rewrite the same directory — exactly-once output
    from at-least-once delivery.

    Reading back: the hive-style directory names make
    ``spark.read.parquet(out_dir)`` partition-INFER a ``batch_id`` column
    into the schema (it is not in the data files). Readers that want only
    the payload columns should ``.drop("batch_id")``, or pass explicit
    batch paths with ``.option("basePath", out_dir)`` disabled — the column
    is also useful as provenance, which is why the layout keeps it.

    Usage::

        q = (df.writeStream.foreachBatch(idempotent_parquet_sink("/data/out"))
               .option("checkpointLocation", ckpt).start())
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        target = os.path.join(out_dir, f"batch_id={batch_id}")
        batch_df.write.mode("overwrite").parquet(target)

    return _write


def scd2_upsert_sink(
    dim_dir: str,
    key: str,
    order_col: str,
    attr_cols: list[str],
    tiebreak: str,
):
    """Return a ``foreachBatch`` function that incrementally maintains an
    SCD-type-2 dimension (``operators.temporal.scd2_from_changelog``
    semantics) from a streaming changelog.

    Layout (all idempotent under micro-batch replay):

    * ``dim_dir/open/v=N`` — the open (is_current) intervals after batch N;
      batch N+1 reads the latest ``v < N+1``. Size = one row per live key.
    * ``dim_dir/closed/batch_id=N`` — intervals CLOSED during batch N,
      append-only: history is never rewritten, so the per-batch write cost
      is O(live keys + batch), not O(all history). Replaying batch N
      overwrites exactly its own directories.

    The full dimension = ``closed/*`` UNION ``open/v=latest``.

    Merge: the previous open intervals re-enter the window as synthetic
    changelog rows ordered by their ``valid_from``; an explicit synthetic
    rank column (0 for reentry rows, 1 for batch events, sorted before the
    user tiebreak) guarantees reentry rows sort first on timestamp ties for
    ANY tiebreak value or type — no assumption that real tiebreaks are
    non-negative. Union the batch, re-run the change-detection window per
    key. Keys untouched by the batch flow
    through unchanged; a batch event with the same attributes as the open
    regime collapses into it (keeping the original ``valid_from``).

    Late data: events older than a key's open-interval start reorder only
    the open regime; closed intervals are immutable. Bound lateness
    upstream with ``withWatermark`` if the changelog can be disordered.

    Scale: per batch, one shuffle of (live keys + batch rows) on ``key`` —
    the incremental shape; nothing proportional to history size.
    """
    import glob as _glob

    from pyspark.sql import functions as F

    from evolution_spark.operators.temporal import scd2_from_changelog

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        changelog = batch_df.select(key, order_col, tiebreak, *attr_cols).withColumn(
            "__synth_rank", F.lit(1)
        )

        versions = []
        for p in _glob.glob(os.path.join(dim_dir, "open", "v=*")):
            try:
                v = int(p.rsplit("v=", 1)[1])
            except ValueError:
                continue
            if v < batch_id:
                versions.append(v)
        if versions:
            prev_open = spark.read.parquet(
                os.path.join(dim_dir, "open", f"v={max(versions)}")
            )
            reentry = prev_open.select(
                F.col(key),
                F.col("valid_from").alias(order_col),
                F.lit(None).cast(changelog.schema[tiebreak].dataType).alias(tiebreak),
                *[F.col(c) for c in attr_cols],
            ).withColumn("__synth_rank", F.lit(0))
            changelog = reentry.unionByName(changelog)

        intervals = scd2_from_changelog(
            changelog, key=key, order_col=order_col, attr_cols=attr_cols,
            tiebreak=["__synth_rank", tiebreak],
        )
        newly_closed = intervals.where(~F.col("is_current"))
        now_open = intervals.where(F.col("is_current"))
        newly_closed.write.mode("overwrite").parquet(
            os.path.join(dim_dir, "closed", f"batch_id={batch_id}")
        )
        now_open.write.mode("overwrite").parquet(
            os.path.join(dim_dir, "open", f"v={batch_id}")
        )

    return _write


def partitioned_rollup_sink(
    out_dir: str,
    day_col: str,
    key_cols: list[str],
    sum_cols: list[str],
):
    """Return a ``foreachBatch`` function maintaining day-partitioned
    rollup CONTRIBUTIONS: each micro-batch aggregates itself to
    (day, keys) -> (n, sum_*) and dynamic-partition-overwrites
    ``out_dir/<day>=D/batch_id=N`` for exactly the days it touches
    (``io/partitioned.py``). Idempotent by construction: replaying batch N
    rewrites only its own (day, N) directories — at-least-once delivery,
    exactly-once totals. Late data lands as a new contribution under the
    old day's directory; history files are never rewritten.

    Serving view = ``read_partitioned_rollup`` (re-aggregates the count/
    sum algebra — contributions are mergeable by design); fold old batches
    with ``io/compact.py`` when the per-day file count grows.

    Scale: per batch, one shuffle of batch-sized aggregate rows; write
    cost is O(days touched by the batch), never O(table)."""
    from pyspark.sql import functions as F

    from evolution_spark.io.partitioned import overwrite_partitions

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        rolled = batch_df.groupBy(day_col, *key_cols).agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        ).withColumn("batch_id", F.lit(batch_id))
        overwrite_partitions(rolled, out_dir, [day_col, "batch_id"])

    return _write


def read_partitioned_rollup(
    spark, out_dir: str, day_col: str, key_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """Merge the contributions written by ``partitioned_rollup_sink`` into
    the current totals: one partition-pruned scan + re-aggregation of the
    mergeable count/sum algebra."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(out_dir)
        .groupBy(day_col, *key_cols)
        .agg(
            F.sum("n").alias("n"),
            *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
        )
    )


def read_scd2_dimension(spark, dim_dir: str) -> DataFrame:
    """Assemble the full SCD2 dimension maintained by ``scd2_upsert_sink``:
    all closed intervals plus the latest open set."""
    import glob as _glob

    closed = sorted(_glob.glob(os.path.join(dim_dir, "closed", "batch_id=*")))
    opens = sorted(
        _glob.glob(os.path.join(dim_dir, "open", "v=*")),
        key=lambda p: int(p.rsplit("v=", 1)[1]),
    )
    parts = closed + opens[-1:]
    if not parts:
        raise FileNotFoundError(f"no SCD2 state under {dim_dir}")
    df = spark.read.parquet(parts[0])
    for p in parts[1:]:
        df = df.unionByName(spark.read.parquet(p))
    return df


def delta_append_sink(table_path: str, app_id: str):
    """Return a ``foreachBatch`` function that appends each micro-batch to a
    native Delta table (``io/delta_log.commit_delta``) with EXACTLY-ONCE
    semantics via the Delta spec's ``txn`` action: every commit records
    ``(appId, batch_id)``, and a replayed batch (at-least-once delivery
    after a checkpoint restart) is detected by ``last_txn_version`` and
    skipped — the same transactional-idempotence contract the real Delta
    streaming sink implements, here over the jar-free log writer.

    Unlike ``idempotent_parquet_sink`` (per-batch directory overwrite),
    this keeps ONE queryable table whose history is the batch sequence:
    time travel to version N shows the stream's prefix, and downstream
    batch jobs read a consistent snapshot mid-stream (the log, not a
    directory listing, defines visibility).

    Usage::

        q = (df.writeStream
               .foreachBatch(delta_append_sink("/data/tbl", "my-query"))
               .option("checkpointLocation", ckpt).start())
    """
    from evolution_spark.io.delta_log import commit_delta, last_txn_version

    # high-water cache: the log is consulted once per sink lifetime (and
    # after that only on a replay suspicion), not once per micro-batch —
    # per-batch full-log replay would be O(batches^2) over the stream
    state: dict = {"last": None, "primed": False}

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if not state["primed"] or (
            state["last"] is not None and batch_id <= state["last"]
        ):
            state["last"] = last_txn_version(table_path, app_id)
            state["primed"] = True
        if state["last"] is not None and batch_id <= state["last"]:
            return  # replayed batch: already committed, skip
        commit_delta(batch_df, table_path, mode="append", txn=(app_id, batch_id))
        state["last"] = batch_id

    return _write


def contract_monitor_sink(rules, out_dir: str):
    """Streaming data-quality monitor: a ``foreachBatch`` function that
    evaluates a data-contract rule battery
    (``operators.curation.data_contract_check`` — every rule one
    conditional count in ONE aggregate over the micro-batch) and appends
    one row per rule per batch to ``out_dir/batch_id=N`` — the ingest-side
    violation dashboard feed. Idempotent under replay: a restarted batch
    overwrites its own directory, same contract as
    ``idempotent_parquet_sink``.

    The monitor is a SIDE channel: it does not filter or mutate the
    stream; compose it after the real sink in the same foreachBatch, or
    run it standalone for audit-only pipelines. Per-batch cost is one
    codegen'd aggregate — no extra shuffle of the payload."""
    from evolution_spark.operators.curation import data_contract_check

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        report = data_contract_check(batch_df, rules)
        target = os.path.join(out_dir, f"batch_id={batch_id}")
        report.write.mode("overwrite").parquet(target)

    return _write
