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
