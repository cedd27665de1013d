"""`evolution_delta` — a real Spark DataSource (PySpark 4 Python
DataSource API) over the native Delta log reader, batch AND streaming:

    spark.dataSource.register(EvolutionDeltaDataSource)
    spark.read.format("evolution_delta").load(path)            # batch
    spark.readStream.format("evolution_delta").load(path)      # incremental

Why this exists: `read_delta_snapshot` returns a DataFrame built from a
file list + anti-joins; this source instead plugs the SAME log/DV/
column-mapping semantics into Spark's source contract, which buys
(a) partition-level parallelism planned by Spark (one input partition per
live file), (b) per-file DV application WITHOUT any join — each executor
drops its own file's deleted positions from the Arrow batches directly,
and (c) a genuine Structured Streaming source whose offsets are log
versions — each micro-batch reads exactly the files the next commits
added, the incremental-consumption contract of the real Delta source
(non-append changes fail the stream unless `ignoreChanges` is set).

Executors yield pyarrow RecordBatches (Arrow-native, no per-row Python);
the driver side only replays the metadata-sized log. Batch options:
``version`` (time travel). Streaming options: ``startingVersion``
(default: all existing data first), ``ignoreChanges`` (skip non-append
commits instead of failing).

The reference engine has no source integration at all (its targets are
``todo!()`` — crates/evolution-target/src/target.rs:31-37); this is the
Spark-first shape such an integration should take."""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


class _FileSlice(InputPartition):
    """One live data file: everything an executor needs to produce its
    rows — absolute path, serialized DV bitmap (or None), the file's
    hive partition values (stringly, with their column names), and the
    physical->logical rename map (column mapping)."""

    def __init__(self, abs_path, dv_blob, partition_values, renames):
        self.abs_path = abs_path
        self.dv_blob = dv_blob
        self.partition_values = partition_values
        self.renames = renames


def _plan_slices(table_path: str, version=None):
    """Driver-side: replay the log and return (logical_schema,
    [_FileSlice...]). Pure metadata work — no SparkSession needed."""
    from evolution_spark.io.delta_log import _replay_log

    table_dir = Path(table_path)
    live, schema_string, part_cols, _, state = _replay_log(
        table_dir, version, return_state=True
    )
    config = dict((state.get("metadata") or {}).get("configuration") or {})
    mode = config.get("delta.columnMapping.mode", "none")
    schema_json = json.loads(schema_string)
    renames = {}
    if mode == "name":
        for f in schema_json["fields"]:
            meta = f.get("metadata") or {}
            phys = meta.get("delta.columnMapping.physicalName", f["name"])
            if phys != f["name"]:
                renames[phys] = f["name"]
    elif mode not in ("none", ""):
        raise ValueError(f"columnMapping mode {mode!r} unsupported (name only)")
    slices = [
        _slice_of(table_dir, p, add, renames)
        for p, add in sorted(live.items())
    ]
    logical = StructType.fromJson(schema_json)
    return logical, slices, renames


def _slice_of(table_dir: Path, stored_path: str, add: dict, renames) -> _FileSlice:
    from urllib.parse import unquote

    from evolution_spark.io.deletion_vectors import (
        read_dv_positions,
        serialize_roaring64,
    )

    dv = add.get("deletionVector")
    blob = None
    if dv:
        # re-serialize to the portable bitmap so the executor payload is
        # compact and self-contained (no file/offset chasing worker-side)
        blob = serialize_roaring64(read_dv_positions(dv, table_dir))
    return _FileSlice(
        str((table_dir / unquote(stored_path)).resolve()),
        blob,
        dict(add.get("partitionValues") or {}),
        dict(renames),
    )


def _read_slice(slice_, logical_schema_json: str):
    """EXECUTOR-side: one file -> Arrow batches in the declared column
    order, deleted positions masked out, partition columns injected as
    typed constants, physical names renamed to logical."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from evolution_spark.io.deletion_vectors import deserialize_roaring64

    schema_json = json.loads(logical_schema_json)
    fields = schema_json["fields"]
    logical_names = [f["name"] for f in fields]
    arrow_of = {
        "long": pa.int64(), "integer": pa.int32(), "short": pa.int16(),
        "byte": pa.int8(), "double": pa.float64(), "float": pa.float32(),
        "string": pa.string(), "boolean": pa.bool_(), "binary": pa.binary(),
        "date": pa.date32(),
    }
    deleted = (
        deserialize_roaring64(slice_.dv_blob) if slice_.dv_blob is not None else None
    )
    pf = pq.ParquetFile(slice_.abs_path)
    row_base = 0
    for batch in pf.iter_batches():
        n = batch.num_rows
        if deleted is not None and len(deleted):
            idx = deleted[(deleted >= row_base) & (deleted < row_base + n)] - row_base
            if len(idx):
                mask = np.ones(n, dtype=bool)
                mask[idx.astype(np.int64)] = False
                batch = batch.filter(pa.array(mask))
        row_base += n
        if batch.num_rows == 0:
            continue
        cols = {}
        present = {slice_.renames.get(c, c): batch.column(i)
                   for i, c in enumerate(batch.schema.names)}
        for f in fields:
            name, typ = f["name"], f["type"]
            if name in present:
                cols[name] = present[name]
            else:
                # partition column (or post-evolution column on a legacy
                # file): typed constant from the add's partitionValues
                raw = slice_.partition_values.get(name)
                at = arrow_of.get(typ if isinstance(typ, str) else "", pa.string())
                if raw is None:
                    cols[name] = pa.nulls(batch.num_rows, type=at)
                else:
                    cols[name] = pa.array([raw] * batch.num_rows).cast(at)
        yield pa.RecordBatch.from_arrays(
            [cols[n_] for n_ in logical_names], names=logical_names
        )


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("evolution_delta requires a path (.load(path))")
        v = options.get("version")
        self.version = int(v) if v is not None else None
        schema, self.slices, _ = _plan_slices(self.path, self.version)
        self.schema_json = schema.json()

    def partitions(self):
        return self.slices

    def read(self, partition):
        yield from _read_slice(partition, self.schema_json)


class _StreamReader(DataSourceStreamReader):
    """Offsets are LOG VERSIONS: micro-batch (start, end] reads exactly
    the data files those commits added. Non-append commits (removes, DV
    re-adds) fail the stream — the consumer's view would silently diverge
    — unless ignoreChanges is set, which skips their adds too."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("evolution_delta requires a path (.load(path))")
        self.ignore_changes = str(
            options.get("ignoreChanges", "false")
        ).lower() == "true"
        start = options.get("startingVersion")
        self._start = int(start) if start is not None else -1
        schema, _, self.renames = _plan_slices(self.path)
        self.schema_json = schema.json()

    def initialOffset(self):
        return {"version": self._start}

    def latestOffset(self):
        from evolution_spark.io.delta_log import _log_versions

        versions = _log_versions(Path(self.path) / "_delta_log")
        return {"version": versions[-1] if versions else -1}

    def partitions(self, start, end):
        from urllib.parse import unquote

        from evolution_spark.io.delta_log import _log_versions, _replay_log

        table_dir = Path(self.path)
        log_dir = table_dir / "_delta_log"
        lo, hi = int(start["version"]), int(end["version"])
        live_before, *_ = (
            _replay_log(table_dir, lo) if lo >= 0 else ({}, None, None, None)
        )
        out = []
        for v in _log_versions(log_dir):
            if v <= lo or v > hi:
                continue
            acts = [json.loads(l) for l in
                    (log_dir / f"{v:020d}.json").read_text().splitlines()]
            adds = [a["add"] for a in acts
                    if "add" in a and a["add"].get("dataChange", True)]
            removes = [a for a in acts
                       if "remove" in a and a["remove"].get("dataChange", True)]
            non_append = bool(removes) or any(
                a["path"] in live_before or a.get("deletionVector")
                for a in adds
            )
            if non_append and not self.ignore_changes:
                raise RuntimeError(
                    f"commit {v} is not an append (removes or DV re-adds "
                    "present); the stream cannot represent row deletion — "
                    "set ignoreChanges=true to skip such commits, or "
                    "consume table_changes() instead"
                )
            if not non_append:
                for add in adds:
                    out.append(
                        _slice_of(table_dir, add["path"], add, self.renames)
                    )
            for a in adds:
                live_before[a["path"]] = a
            for r in removes:
                live_before.pop(r["remove"]["path"], None)
        return out

    def read(self, partition):
        yield from _read_slice(partition, self.schema_json)

    def commit(self, end):
        pass


class EvolutionDeltaDataSource(DataSource):
    @classmethod
    def name(cls):
        return "evolution_delta"

    def schema(self):
        schema, _, _ = _plan_slices(self.options.get("path"))
        return schema

    def reader(self, schema):
        return _BatchReader(self.options)

    def streamReader(self, schema):
        return _StreamReader(self.options)


def register_delta_source(spark) -> None:
    """Idempotently register the format for this session."""
    spark.dataSource.register(EvolutionDeltaDataSource)
