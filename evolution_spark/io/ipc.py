"""Arrow IPC sink — implements the reference's declared-but-``todo!()`` Ipc
target (crates/evolution-target/src/target.rs:31-37, examples/full/src/cli.rs:205-207).

Each Spark task streams its partition through ``mapInArrow`` and writes its own
``part-*.arrow`` file (Arrow IPC *file* format), so the sink is fully
distributed — no driver materialization, no single-writer bottleneck. The tiny
result batch (one path+rowcount row per partition) is all that returns to the
driver.
"""

from __future__ import annotations

import os
import uuid
from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

_RESULT_SCHEMA = StructType(
    [StructField("path", StringType()), StructField("n_rows", LongType())]
)


def write_ipc(df: DataFrame, path: str) -> list[tuple[str, int]]:
    """Write ``df`` as a directory of Arrow IPC files, one per partition.

    Returns ``[(file_path, n_rows), ...]`` for the written parts. Empty
    partitions write no file.
    """
    os.makedirs(path, exist_ok=True)

    def _write_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        writer = None
        out_path = os.path.join(path, f"part-{uuid.uuid4().hex}.arrow")
        n = 0
        for batch in batches:
            if writer is None:
                writer = pa.ipc.new_file(out_path, batch.schema)
            writer.write_batch(batch)
            n += batch.num_rows
        if writer is not None:
            writer.close()
            yield pa.RecordBatch.from_pydict({"path": [out_path], "n_rows": [n]})

    result = df.mapInArrow(_write_partition, _RESULT_SCHEMA).collect()
    return [(r["path"], r["n_rows"]) for r in result]


def read_ipc(spark, path: str, schema: StructType) -> DataFrame:
    """Distributed Arrow IPC source — the read half of the round-trip the
    reference never shipped. Each ``part-*.arrow`` file is listed (names
    only) on the driver, then deserialized INSIDE executors: the file list
    parallelizes across tasks and each task streams its files' record
    batches through ``mapInArrow`` (zero-copy Arrow both sides, no driver
    materialization).

    ``schema`` is required (single-pass read, explicit contract — same
    discipline as the JSONL source). One task per file; IPC files are not
    splittable, so size parts at write time (one per input partition).
    """
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".arrow")
    )
    if not files:
        raise FileNotFoundError(f"no .arrow files under {path}")
    file_df = spark.createDataFrame(
        [(f,) for f in files], StructType([StructField("path", StringType())])
    ).repartition(len(files))

    def _read(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for p in batch.column("path").to_pylist():
                reader = pa.ipc.open_file(p)
                for i in range(reader.num_record_batches):
                    yield reader.get_batch(i)

    return file_df.mapInArrow(_read, schema)
