"""Minimal Delta Lake table writer: Spark parquet data files + a
spec-compliant ``_delta_log`` commit, no connector jar required.

The Delta transaction log is an open JSON protocol (delta.io
PROTOCOL.md): a table is a directory of parquet files plus
``_delta_log/<version>.json`` holding newline-delimited actions
(``protocol``, ``metaData``, ``add``). This module writes a SINGLE-COMMIT
snapshot (version 0) of a DataFrame:

* data files: a normal distributed ``df.write.parquet`` — cluster-scale,
  nothing driver-bound;
* the commit: the driver lists the written files (a metadata-sized
  operation — one entry per file), derives per-file ``numRecords`` from
  parquet footers, and writes the log atomically (temp file + rename).

``metaData.schemaString`` is Spark's ``StructType.json()`` — the Delta
spec adopts Spark's schema JSON verbatim, so the round-trip is exact.
Any Delta reader (Spark+delta jar, delta-rs, DuckDB's delta extension)
can open the result. Scope: snapshot writes (error/overwrite). Appends,
deletes, time travel, and checkpoints are the connector's job — this is
the write-side parity for the reference's declared-but-``todo!()`` Delta
target (crates/evolution-target/src/target.rs:31-37,
examples/delta/src/main.rs:28-30).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from pathlib import Path
from urllib.parse import quote

from pyspark.sql import DataFrame

PROTOCOL = {"minReaderVersion": 1, "minWriterVersion": 2}


def _data_files(table_dir: Path, part_cols: list[str]):
    """Yield (relative_path, partition_values, size_bytes) for every data
    file under the table dir, parsing hive-style partition directories."""
    for p in sorted(table_dir.rglob("*.parquet")):
        if "_delta_log" in p.parts:
            continue
        rel = p.relative_to(table_dir)
        values: dict[str, str] = {}
        for part in rel.parts[:-1]:
            if "=" in part:
                k, _, v = part.partition("=")
                values[k] = v
        if sorted(values) != sorted(part_cols):
            raise ValueError(
                f"partition dirs {sorted(values)} != declared {sorted(part_cols)}"
            )
        yield rel.as_posix(), values, p.stat().st_size


def write_delta_snapshot(
    df: DataFrame,
    path: str,
    mode: str = "error",
    partition_by: list[str] | None = None,
    name: str | None = None,
) -> dict:
    """Write ``df`` as a version-0 Delta table at ``path``.

    ``mode``: ``error`` refuses an existing table dir; ``overwrite``
    replaces it (fresh snapshot — still one commit). Returns the commit
    summary (version, file count, row count) for logging/tests.
    """
    import pyarrow.parquet as pq

    table_dir = Path(path)
    if table_dir.exists():
        if mode == "overwrite":
            shutil.rmtree(table_dir)
        else:
            raise ValueError(f"Delta table dir exists: {path} (mode={mode})")

    part_cols = list(partition_by or [])
    writer = df.write.mode("error")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(str(table_dir))

    now_ms = int(time.time() * 1000)
    actions: list[dict] = []
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "WRITE",
                "operationParameters": {"mode": "ErrorIfExists"},
                "engineInfo": "evolution-spark-delta-writer/1.0",
            }
        }
    )
    actions.append({"protocol": dict(PROTOCOL)})
    actions.append(
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "name": name,
                "format": {"provider": "parquet", "options": {}},
                "schemaString": df.schema.json(),
                "partitionColumns": part_cols,
                "configuration": {},
                "createdTime": now_ms,
            }
        }
    )
    total_rows = 0
    n_files = 0
    for rel, values, size in _data_files(table_dir, part_cols):
        n_rows = pq.ParquetFile(table_dir / rel).metadata.num_rows
        total_rows += n_rows
        n_files += 1
        actions.append(
            {
                "add": {
                    # the spec stores paths relative + URL-encoded
                    "path": quote(rel),
                    "partitionValues": values,
                    "size": size,
                    "modificationTime": now_ms,
                    "dataChange": True,
                    "stats": json.dumps({"numRecords": n_rows}),
                }
            }
        )

    log_dir = table_dir / "_delta_log"
    log_dir.mkdir()
    commit = log_dir / f"{0:020d}.json"
    tmp = log_dir / f".{0:020d}.json.tmp"
    tmp.write_text("".join(json.dumps(a) + "\n" for a in actions))
    os.replace(tmp, commit)  # atomic publish: readers never see a torn log
    return {"version": 0, "files": n_files, "rows": total_rows, "path": str(commit)}


def read_delta_snapshot(spark, path: str) -> DataFrame:
    """Read a version-0 snapshot written by ``write_delta_snapshot`` by
    replaying the log's ``add`` actions (no connector): the file list
    comes from the commit, NOT a directory listing — exactly the Delta
    read contract (uncommitted/orphan files are invisible)."""
    from urllib.parse import unquote

    table_dir = Path(path)
    commit = table_dir / "_delta_log" / f"{0:020d}.json"
    adds = []
    schema_string = None
    for line in commit.read_text().splitlines():
        action = json.loads(line)
        if "add" in action:
            adds.append(str(table_dir / unquote(action["add"]["path"])))
        elif "metaData" in action:
            schema_string = action["metaData"]["schemaString"]
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(schema_string))
    # basePath keeps hive partition columns resolvable from the file paths
    return (
        spark.read.schema(schema)
        .option("basePath", str(table_dir))
        .parquet(*adds)
    )
