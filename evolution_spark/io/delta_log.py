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
can open the result. Scope: version-0 snapshots (``write_delta_snapshot``),
multi-version APPEND/OVERWRITE commits (``commit_delta`` — remove+add
actions, optimistic-concurrency publish), and time-travel reads
(``read_delta_snapshot(version=N)`` replays the log through N). Checkpoints
and VACUUM remain the connector's job — this is the write-side parity for
the reference's declared-but-``todo!()`` Delta target
(crates/evolution-target/src/target.rs:31-37,
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
    txn: tuple[str, int] | None = None,
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
    if txn is not None:
        actions.append({"txn": {"appId": txn[0], "version": txn[1]}})
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


def _log_versions(log_dir: Path) -> list[int]:
    return sorted(int(p.stem) for p in log_dir.glob("*.json") if p.stem.isdigit())


def _replay_log(table_dir: Path, version: int | None = None):
    """Replay commits 0..version (default: latest). Returns (live add
    actions keyed by stored path, schemaString, partitionColumns, the
    resolved version). The live set applies ``add``/``remove`` in commit
    order — exactly the Delta snapshot-reconstruction contract."""
    log_dir = table_dir / "_delta_log"
    versions = _log_versions(log_dir)
    if not versions:
        raise FileNotFoundError(f"no Delta log at {log_dir}")
    target = versions[-1] if version is None else version
    if target not in versions:
        raise ValueError(f"version {target} not in log (have {versions})")
    live: dict[str, dict] = {}
    schema_string = None
    part_cols: list[str] = []
    for v in versions:
        if v > target:
            break
        for line in (log_dir / f"{v:020d}.json").read_text().splitlines():
            action = json.loads(line)
            if "add" in action:
                live[action["add"]["path"]] = action["add"]
            elif "remove" in action:
                live.pop(action["remove"]["path"], None)
            elif "metaData" in action:
                schema_string = action["metaData"]["schemaString"]
                part_cols = action["metaData"].get("partitionColumns", [])
    return live, schema_string, part_cols, target


def last_txn_version(path: str, app_id: str) -> int | None:
    """Highest ``txn`` action version committed for ``app_id`` (the Delta
    spec's streaming-idempotence mechanism), or None if never seen."""
    table_dir = Path(path)
    log_dir = table_dir / "_delta_log"
    if not log_dir.exists():
        return None
    best: int | None = None
    for v in _log_versions(log_dir):
        for line in (log_dir / f"{v:020d}.json").read_text().splitlines():
            action = json.loads(line)
            txn = action.get("txn")
            if txn and txn.get("appId") == app_id:
                best = txn["version"] if best is None else max(best, txn["version"])
    return best


def commit_delta(
    df: DataFrame,
    path: str,
    mode: str = "append",
    txn: tuple[str, int] | None = None,
) -> dict:
    """Commit a new version to an existing Delta table (create version 0 if
    the table does not exist). ``mode='append'`` adds files; ``'overwrite'``
    also emits ``remove`` actions for every previously-live file (logical
    delete — old versions stay readable, which is what makes time travel
    work). Publish is optimistic-concurrency: the commit file is written to
    a temp name and atomically renamed; a version collision from a
    concurrent writer surfaces as an error instead of a lost update.

    Scale: the data write is a normal distributed ``df.write.parquet`` into
    a staging dir; only the file MOVES and the metadata-sized log write run
    on the driver (one entry per file, never per row)."""
    import pyarrow.parquet as pq

    table_dir = Path(path)
    if not (table_dir / "_delta_log").exists():
        if mode not in ("append", "overwrite", "error"):
            raise ValueError(f"unknown mode {mode!r}")
        return write_delta_snapshot(df, path, mode="error", txn=txn)

    from pyspark.sql.types import StructType

    live, schema_string, part_cols, latest = _replay_log(table_dir)
    stored = StructType.fromJson(json.loads(schema_string))
    # names+types must match; writing a non-nullable column into a nullable
    # table column is fine (the reverse would break the table invariant)
    incompatible = [f.name for f in df.schema] != [f.name for f in stored] or any(
        a.dataType != b.dataType or (a.nullable and not b.nullable)
        for a, b in zip(df.schema, stored)
    )
    if incompatible:
        raise ValueError(
            "schema mismatch vs table metaData — evolve via a new metaData "
            "commit (not supported here), or align the DataFrame schema"
        )
    version = latest + 1
    stage = table_dir / f"_staging_v{version}"
    if stage.exists():
        shutil.rmtree(stage)
    writer = df.write.mode("error")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(str(stage))

    now_ms = int(time.time() * 1000)
    actions: list[dict] = [
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "WRITE",
                "operationParameters": {
                    "mode": "Append" if mode == "append" else "Overwrite"
                },
                "engineInfo": "evolution-spark-delta-writer/1.0",
            }
        }
    ]
    if txn is not None:
        # spec `txn` action: (appId, version) marks this commit as having
        # applied the app's batch `version` — the reader side of streaming
        # exactly-once (see last_txn_version)
        actions.append({"txn": {"appId": txn[0], "version": txn[1]}})
    if mode == "overwrite":
        for stored_path in live:
            actions.append(
                {
                    "remove": {
                        "path": stored_path,
                        "deletionTimestamp": now_ms,
                        "dataChange": True,
                    }
                }
            )
    total_rows = 0
    n_files = 0
    for src in sorted(stage.rglob("*.parquet")):
        rel = src.relative_to(stage)
        # version-unique physical name: appended files can never collide
        # with a prior commit's part files
        dest_rel = rel.parent / f"part-{version:05d}-{uuid.uuid4().hex}.parquet"
        dest = table_dir / dest_rel
        dest.parent.mkdir(parents=True, exist_ok=True)
        os.replace(src, dest)
        n_rows = pq.ParquetFile(dest).metadata.num_rows
        total_rows += n_rows
        n_files += 1
        values = {
            k: v
            for part in dest_rel.parts[:-1]
            if "=" in part
            for k, _, v in [part.partition("=")]
        }
        actions.append(
            {
                "add": {
                    "path": quote(dest_rel.as_posix()),
                    "partitionValues": values,
                    "size": dest.stat().st_size,
                    "modificationTime": now_ms,
                    "dataChange": True,
                    "stats": json.dumps({"numRecords": n_rows}),
                }
            }
        )
    shutil.rmtree(stage)

    log_dir = table_dir / "_delta_log"
    commit = log_dir / f"{version:020d}.json"
    if commit.exists():
        raise RuntimeError(f"concurrent commit detected: {commit} exists")
    tmp = log_dir / f".{version:020d}.json.tmp"
    tmp.write_text("".join(json.dumps(a) + "\n" for a in actions))
    os.replace(tmp, commit)
    return {"version": version, "files": n_files, "rows": total_rows}


def read_delta_snapshot(spark, path: str, version: int | None = None) -> DataFrame:
    """Read a snapshot of the table at ``version`` (default: latest) by
    replaying the log's ``add``/``remove`` actions (no connector): the file
    list comes from the commits, NOT a directory listing — exactly the
    Delta read contract (uncommitted/orphan/staged files are invisible,
    and every historical version stays readable until VACUUM)."""
    from urllib.parse import unquote

    table_dir = Path(path)
    live, schema_string, _, _ = _replay_log(table_dir, version)
    adds = [str(table_dir / unquote(p)) for p in sorted(live)]
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(schema_string))
    if not adds:
        return spark.createDataFrame([], schema)
    # basePath keeps hive partition columns resolvable from the file paths
    return (
        spark.read.schema(schema)
        .option("basePath", str(table_dir))
        .parquet(*adds)
    )


def merge_delta_cdc(
    spark,
    path: str,
    changes: DataFrame,
    key: str,
    op_col: str = "_op",
) -> dict:
    """MERGE a CDC change set into a Delta table as one new commit.

    ``changes`` carries the table's columns plus ``op_col`` with ``'u'``
    (upsert: update if the key exists, insert if not) or ``'d'`` (delete).
    Semantics match ``MERGE INTO ... WHEN MATCHED [AND op='d'] THEN DELETE
    / WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED [AND op='u'] THEN
    INSERT *`` — implemented as one full-outer join of the current snapshot
    with the change set, then committed via ``commit_delta(overwrite)`` so
    the pre-merge version stays time-travel readable.

    Scale: the join shuffles both sides on the key once; at production
    scale the standard refinement is file pruning (join change keys against
    add-action min/max stats to rewrite only touched files) — the log
    layout here already records per-file stats to enable that."""
    from pyspark.sql import functions as F

    target = read_delta_snapshot(spark, path)
    data_cols = target.columns
    if key not in data_cols:
        raise ValueError(f"key {key!r} not in table columns {data_cols}")
    ch = changes.select(
        F.col(key).alias("__k"),
        F.col(op_col).alias("__op"),
        *[F.col(c).alias(f"__c_{c}") for c in data_cols if c != key],
    )
    joined = target.join(ch, target[key] == ch["__k"], "full_outer")
    merged = (
        joined
        # WHEN MATCHED AND op='d' THEN DELETE; a delete for a missing key is
        # a no-op (also dropped here)
        .where(~F.coalesce(F.col("__op") == "d", F.lit(False)))
        .select(
            F.coalesce(target[key], F.col("__k")).alias(key),
            *[
                F.when(F.col("__op") == "u", F.col(f"__c_{c}"))
                .otherwise(target[c])
                .alias(c)
                for c in data_cols
                if c != key
            ],
        )
    )
    summary = commit_delta(merged, path, mode="overwrite")
    return summary
