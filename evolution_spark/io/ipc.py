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
