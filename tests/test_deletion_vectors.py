"""Delta deletion-vector READ support: Z85/roaring codec roundtrips and
end-to-end reads of a synthetic FOREIGN DV-bearing table (the log and DV
files are written bit-level by the test, per Delta PROTOCOL.md), proving
DV-deleted rows never resurrect — through direct reads, time travel,
order-shuffled commits, checkpoints, and MERGE rewrites."""

from __future__ import annotations

import json
import struct
import uuid
from pathlib import Path

import numpy as np
import pytest
from pyspark.sql import functions as F

from evolution_spark.io.deletion_vectors import (
    deserialize_roaring64,
    dv_unique_id,
    inline_dv_descriptor,
    read_dv_positions,
    serialize_roaring64,
    write_dv_file,
    z85_decode,
    z85_encode,
)


# --------------------------------------------------------------------------
# codec units (no Spark)
# --------------------------------------------------------------------------


def test_z85_roundtrip_and_reference_vector():
    # ZeroMQ RFC 32 reference vector: 0x86 0x4F 0xD2 0x6F 0xB5 0x59 0xF7 0x5B
    # encodes to "HelloWorld"
    assert z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) == "HelloWorld"
    import os

    for n in (1, 2, 3, 4, 16, 37):
        b = os.urandom(n)
        assert z85_decode(z85_encode(b), n) == b


def test_roaring64_roundtrip_shapes():
    cases = [
        np.array([], dtype=np.uint64),
        np.array([0], dtype=np.uint64),
        np.array([0, 1, 5, 70000, 131071], dtype=np.uint64),  # two 16-bit keys
        np.arange(0, 10000, dtype=np.uint64),  # dense -> bitset container
        np.array([3, (1 << 32) + 7, (1 << 33) + 1], dtype=np.uint64),  # buckets
        np.random.default_rng(7).choice(1 << 20, size=5000, replace=False).astype(np.uint64),
    ]
    for c in cases:
        got = deserialize_roaring64(serialize_roaring64(c))
        assert np.array_equal(got, np.unique(c).astype(np.int64))


def test_roaring_run_container_decode():
    """Foreign writers emit run containers (cookie 12347); hand-build one:
    key 0, runs [5..9] and [100..100] -> values {5,6,7,8,9,100}."""
    payload = (
        struct.pack("<I", 12347 | (0 << 16))  # 1 container, SERIAL_COOKIE
        + bytes([0b1])  # run flag for container 0
        + struct.pack("<HH", 0, 6 - 1)  # key=0, cardinality-1
        # n < 4 with runs -> no offset header
        + struct.pack("<H", 2)  # numRuns
        + struct.pack("<HH", 5, 4)  # start=5, len-1=4 -> 5..9
        + struct.pack("<HH", 100, 0)  # 100..100
    )
    data = struct.pack("<IQ", 1681511377, 1) + struct.pack("<I", 0) + payload
    assert list(deserialize_roaring64(data)) == [5, 6, 7, 8, 9, 100]


def test_dv_file_and_inline_roundtrip(tmp_path):
    desc = write_dv_file(tmp_path, [1, 3, 5, 1_000_000])
    assert desc["storageType"] == "u" and desc["cardinality"] == 4
    assert list(read_dv_positions(desc, tmp_path)) == [1, 3, 5, 1_000_000]
    # corrupt the checksum -> loud failure
    from evolution_spark.io.deletion_vectors import dv_absolute_path

    p = Path(dv_absolute_path(desc, tmp_path))
    raw = bytearray(p.read_bytes())
    raw[-1] ^= 0xFF
    p.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="checksum"):
        read_dv_positions(desc, tmp_path)

    inl = inline_dv_descriptor([2, 9])
    assert inl["storageType"] == "i"
    assert list(read_dv_positions(inl, tmp_path)) == [2, 9]
    assert dv_unique_id(inl).startswith("i")
    assert dv_unique_id(None) is None


# --------------------------------------------------------------------------
# synthetic foreign DV table
# --------------------------------------------------------------------------


def _write_foreign_dv_table(spark, table_dir: Path, n=100, commit_order="remove_first"):
    """Write a single-file parquet table plus a hand-built Delta log the way
    a DV-enabled foreign writer (e.g. Databricks DELETE) would: v0 =
    protocol(reader 3 + deletionVectors) + metaData + add; v1 = remove(old
    add) + add(same path, deletionVector=multiples-of-7 positions)."""
    table_dir.mkdir(parents=True)
    import pyarrow as pa
    import pyarrow.parquet as papq

    name = f"part-00000-{uuid.uuid4().hex}.parquet"
    papq.write_table(
        pa.table({"k": pa.array(range(n), pa.int64()),
                  "v": pa.array([i * 10 for i in range(n)], pa.int64())}),
        table_dir / name,
    )
    schema_string = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "long", "nullable": True, "metadata": {}},
        ],
    })
    log = table_dir / "_delta_log"
    log.mkdir()
    v0 = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": str(uuid.uuid4()), "format": {"provider": "parquet"},
                      "schemaString": schema_string, "partitionColumns": [],
                      "configuration": {}, "createdTime": 0}},
        {"add": {"path": name, "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    (log / f"{0:020d}.json").write_text("".join(json.dumps(a) + "\n" for a in v0))

    deleted_pos = [i for i in range(n) if i % 7 == 0]
    desc = write_dv_file(table_dir, deleted_pos)
    remove = {"remove": {"path": name, "deletionTimestamp": 1, "dataChange": True}}
    add = {"add": {"path": name, "partitionValues": {}, "size": 1,
                   "modificationTime": 1, "dataChange": True,
                   "deletionVector": desc}}
    actions = [remove, add] if commit_order == "remove_first" else [add, remove]
    (log / f"{1:020d}.json").write_text("".join(json.dumps(a) + "\n" for a in actions))
    return name, deleted_pos


@pytest.mark.parametrize("order", ["remove_first", "add_first"])
def test_foreign_dv_table_read(spark, tmp_path, order):
    """Deleted rows are absent regardless of action order within the DELETE
    commit (the spec keys file actions by (path, dvUniqueId))."""
    from evolution_spark.io.delta_log import read_delta_snapshot

    table = tmp_path / f"dv_{order}"
    _, deleted = _write_foreign_dv_table(spark, table, n=100, commit_order=order)
    df = read_delta_snapshot(spark, str(table))
    rows = {r.k for r in df.collect()}
    assert rows == set(range(100)) - set(deleted)
    assert df.columns == ["k", "v"]
    # values of surviving rows intact
    assert {r.v for r in df.collect()} == {k * 10 for k in rows}
    # time travel to v0: pre-DELETE snapshot has all rows
    assert read_delta_snapshot(spark, str(table), version=0).count() == 100


def test_foreign_dv_inline_and_second_delete(spark, tmp_path):
    """A second DELETE supersedes the first DV (remove pairs on the OLD
    dvUniqueId, the new add carries the union bitmap) — and inline
    (storageType 'i') descriptors decode the same as on-disk ones."""
    from evolution_spark.io.delta_log import read_delta_snapshot

    table = tmp_path / "dv2"
    name, deleted1 = _write_foreign_dv_table(spark, table, n=100)
    live_add = json.loads(
        (table / "_delta_log" / f"{1:020d}.json").read_text().splitlines()[1]
    )["add"]
    old_desc = live_add["deletionVector"]
    # foreign writer deletes multiples of 11 too: new DV = union, inline
    deleted2 = sorted(set(deleted1) | {i for i in range(100) if i % 11 == 0})
    new_desc = inline_dv_descriptor(deleted2)
    v2 = [
        {"remove": {"path": name, "deletionTimestamp": 2, "dataChange": True,
                    "deletionVector": old_desc}},
        {"add": {"path": name, "partitionValues": {}, "size": 1,
                 "modificationTime": 2, "dataChange": True,
                 "deletionVector": new_desc}},
    ]
    (table / "_delta_log" / f"{2:020d}.json").write_text(
        "".join(json.dumps(a) + "\n" for a in v2)
    )
    rows = {r.k for r in read_delta_snapshot(spark, str(table)).collect()}
    assert rows == set(range(100)) - set(deleted2)
    # v1 still shows only the first delete
    rows1 = {r.k for r in read_delta_snapshot(spark, str(table), version=1).collect()}
    assert rows1 == set(range(100)) - set(deleted1)


def test_dv_survives_checkpoint(spark, tmp_path):
    """checkpoint_delta must carry DV descriptors — a checkpoint replay
    that dropped them would resurrect every deleted row."""
    from evolution_spark.io.delta_log import checkpoint_delta, read_delta_snapshot

    table = tmp_path / "dvckpt"
    _, deleted = _write_foreign_dv_table(spark, table, n=100)
    before = {r.k for r in read_delta_snapshot(spark, str(table)).collect()}
    checkpoint_delta(str(table))
    assert (table / "_delta_log" / "_last_checkpoint").exists()
    after = {r.k for r in read_delta_snapshot(spark, str(table)).collect()}
    assert after == before == set(range(100)) - set(deleted)


def test_reader_guard_still_refuses_unknown_features(spark, tmp_path):
    """deletionVectors is now accepted, but any UNIMPLEMENTED v3 reader
    feature (icebergCompatV3, future names, ...) still refuses loudly.
    (collations became a schema-gated tolerance in round 11, so the
    unknown example is a genuinely future feature name.)"""
    from evolution_spark.io.delta_log import DeltaProtocolError, read_delta_snapshot

    table = tmp_path / "dvguard"
    _write_foreign_dv_table(spark, table, n=10)
    log = table / "_delta_log"
    lines = (log / f"{0:020d}.json").read_text().splitlines()
    proto = json.loads(lines[0])
    proto["protocol"]["readerFeatures"] = [
        "deletionVectors", "someFutureFeature"
    ]
    lines[0] = json.dumps(proto)
    (log / f"{0:020d}.json").write_text("\n".join(lines) + "\n")
    with pytest.raises(DeltaProtocolError, match="someFutureFeature"):
        read_delta_snapshot(spark, str(table))


def test_dv_full_32bit_crc(tmp_path):
    """Foreign writers store the FULL 32-bit CRC (Java `(int)
    CRC32.getValue()`); a 31-bit mask would reject ~half of all real DV
    files. Pin a payload whose CRC has the high bit set."""
    import struct
    import zlib

    from evolution_spark.io.deletion_vectors import (
        dv_absolute_path,
        serialize_roaring64,
        write_dv_file,
    )

    # find a position set whose serialized bitmap CRC sets bit 31
    for seed in range(200):
        positions = [seed, seed + 2, seed + 70000]
        if zlib.crc32(serialize_roaring64(positions)) & 0x80000000:
            break
    else:
        raise AssertionError("no high-bit CRC found in 200 tries")
    desc = write_dv_file(tmp_path, positions)
    raw = Path(dv_absolute_path(desc, tmp_path)).read_bytes()
    (stored,) = struct.unpack_from(">I", raw, 1 + 4 + desc["sizeInBytes"])
    assert stored == zlib.crc32(serialize_roaring64(positions)) & 0xFFFFFFFF
    assert stored & 0x80000000  # the adversarial case actually exercised
    assert list(read_dv_positions(desc, tmp_path)) == sorted(positions)


def test_dv_applies_under_percent_encoded_paths(spark, tmp_path):
    """_metadata.file_path is a percent-encoded Hadoop URI (a dir named
    'seg=A B' appears as 'seg=A%20B'); the DV anti-join must decode it or
    deleted rows silently resurrect for any encodable path."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    from evolution_spark.io.delta_log import read_delta_snapshot

    table = tmp_path / "dvenc"
    sub = table / "seg=A B"
    sub.mkdir(parents=True)
    name = f"seg=A B/part-{uuid.uuid4().hex}.parquet"
    papq.write_table(
        pa.table({"k": pa.array(range(20), pa.int64())}), table / name
    )
    schema_string = json.dumps({
        "type": "struct",
        "fields": [{"name": "k", "type": "long", "nullable": True,
                    "metadata": {}}],
    })
    log = table / "_delta_log"
    log.mkdir()
    from urllib.parse import quote

    stored = quote(name)  # spec: add paths are URL-encoded
    desc = write_dv_file(table, [0, 5, 19])
    v0 = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": str(uuid.uuid4()), "format": {"provider": "parquet"},
                      "schemaString": schema_string, "partitionColumns": [],
                      "configuration": {}, "createdTime": 0}},
        {"add": {"path": stored, "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "deletionVector": desc}},
    ]
    (log / f"{0:020d}.json").write_text(
        "".join(json.dumps(a) + "\n" for a in v0)
    )
    rows = {r.k for r in read_delta_snapshot(spark, str(table)).collect()}
    assert rows == set(range(20)) - {0, 5, 19}


# --------------------------------------------------------------------------
# merge-on-read DELETE (delete_delta_rows)
# --------------------------------------------------------------------------


def test_delete_delta_rows_merge_on_read(spark, tmp_path):
    """DELETE writes DVs instead of rewriting files: data files untouched,
    protocol upgraded in the same commit, deletes stack by union, time
    travel sees pre-DELETE rows, OPTIMIZE materializes, VACUUM reclaims
    superseded DV files."""
    from evolution_spark.io.delta_log import (
        delete_delta_rows,
        optimize_delta,
        read_delta_snapshot,
        vacuum_delta,
        write_delta_snapshot,
    )

    path = str(tmp_path / "mor")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("m")
    ).repartition(4)
    write_delta_snapshot(df, path)
    data_files = sorted(Path(path).rglob("*.parquet"))
    mtimes = {p: p.stat().st_mtime_ns for p in data_files}

    res = delete_delta_rows(spark, path, "m = 3")
    assert res["deleted_rows"] == 10 and res["files_touched"] >= 1
    # merge-on-read: no data file rewritten
    assert {p: p.stat().st_mtime_ns for p in data_files} == mtimes
    back = read_delta_snapshot(spark, path)
    assert back.count() == 90 and back.where("m = 3").count() == 0

    # protocol upgraded with the feature lists
    lines = (Path(path) / "_delta_log" / f"{res['version']:020d}.json").read_text()
    proto = next(json.loads(l)["protocol"] for l in lines.splitlines()
                 if "protocol" in l)
    assert proto["minReaderVersion"] == 3 and proto["minWriterVersion"] == 7
    assert "deletionVectors" in proto["readerFeatures"]

    # second DELETE: union bitmap, no resurrect of the first
    res2 = delete_delta_rows(spark, path, "k < 20")
    assert res2["deleted_rows"] == 18  # 20 minus k=3,13 already deleted
    back2 = read_delta_snapshot(spark, path)
    assert {r.k for r in back2.collect()} == {
        k for k in range(100) if k % 10 != 3 and k >= 20
    }
    # empty match is a no-op (no commit published)
    res3 = delete_delta_rows(spark, path, "k > 1000")
    assert res3["version"] is None and res3["deleted_rows"] == 0

    # time travel to before the deletes
    assert read_delta_snapshot(spark, path, version=0).count() == 100

    # OPTIMIZE materializes the deletes (reads through DVs)
    opt = optimize_delta(spark, path, target_files=1)
    assert read_delta_snapshot(spark, path).count() == 72
    # VACUUM with the default staleness window SPARES fresh DV files (an
    # unreferenced young DV may belong to an in-flight DELETE)...
    vacuum_delta(path, keep_versions=1)
    assert list(Path(path).rglob("deletion_vector_*.bin"))
    # ...and reclaims them once they age past the window
    vacuum_delta(path, keep_versions=1, stale_staging_hours=0)
    assert not list(Path(path).rglob("deletion_vector_*.bin"))
    assert read_delta_snapshot(spark, path).count() == 72


def test_delete_delta_rows_guards(spark, tmp_path):
    import pathlib

    from evolution_spark.io.delta_log import (
        DeltaProtocolError,
        delete_delta_rows,
        write_delta_snapshot,
    )

    path = str(tmp_path / "mor_guard")
    df = spark.range(10).select(F.col("id").alias("k"))
    write_delta_snapshot(df, path)
    log = pathlib.Path(path) / "_delta_log"
    v0 = (log / f"{0:020d}.json").read_text().splitlines()
    meta = next(json.loads(l) for l in v0 if "metaData" in l)
    meta["metaData"]["configuration"] = {"delta.appendOnly": "true"}
    (log / f"{1:020d}.json").write_text(json.dumps(meta) + "\n")
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        delete_delta_rows(spark, path, "k = 1")


def test_delete_on_foreign_dv_table(spark, tmp_path):
    """Our DELETE composes with a FOREIGN writer's existing DVs: the new
    bitmap unions the old positions (remove pairs on the old dvUniqueId)."""
    from evolution_spark.io.delta_log import delete_delta_rows, read_delta_snapshot

    table = tmp_path / "mor_foreign"
    _, deleted1 = _write_foreign_dv_table(spark, table, n=100)  # k % 7 == 0
    res = delete_delta_rows(spark, str(table), "k % 9 = 0")
    expect_gone = {k for k in range(100) if k % 7 == 0 or k % 9 == 0}
    assert res["deleted_rows"] == len(
        {k for k in range(100) if k % 9 == 0 and k % 7 != 0}
    )
    rows = {r.k for r in read_delta_snapshot(spark, str(table)).collect()}
    assert rows == set(range(100)) - expect_gone


# --------------------------------------------------------------------------
# column mapping (name mode)
# --------------------------------------------------------------------------


def _write_column_mapped_table(spark, table_dir: Path, n=30, with_dv=False):
    """Foreign-style column-mapped table: parquet stores PHYSICAL names
    (col-<hex>), the Delta schema maps them to logical names via field
    metadata — what a Databricks table looks like after enabling
    columnMapping (or any RENAME/DROP COLUMN)."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    table_dir.mkdir(parents=True)
    pk, pv = f"col-{uuid.uuid4().hex[:8]}", f"col-{uuid.uuid4().hex[:8]}"
    name = f"part-00000-{uuid.uuid4().hex}.parquet"
    papq.write_table(
        pa.table({pk: pa.array(range(n), pa.int64()),
                  pv: pa.array([i * 10 for i in range(n)], pa.int64())}),
        table_dir / name,
    )
    schema_string = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": pk}},
            {"name": "v", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": pv}},
        ],
    })
    feats = ["columnMapping"] + (["deletionVectors"] if with_dv else [])
    add = {"path": name, "partitionValues": {}, "size": 1,
           "modificationTime": 0, "dataChange": True,
           # stats use PHYSICAL names on mapped tables
           "stats": json.dumps({"numRecords": n,
                                "minValues": {pk: 0},
                                "maxValues": {pk: n - 1}})}
    if with_dv:
        add["deletionVector"] = write_dv_file(table_dir, [0, 2, 4])
    v0 = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": feats, "writerFeatures": feats}},
        {"metaData": {"id": str(uuid.uuid4()), "format": {"provider": "parquet"},
                      "schemaString": schema_string, "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": "name"},
                      "createdTime": 0}},
        {"add": add},
    ]
    log = table_dir / "_delta_log"
    log.mkdir()
    (log / f"{0:020d}.json").write_text(
        "".join(json.dumps(a) + "\n" for a in v0)
    )


def test_column_mapping_name_mode_read(spark, tmp_path):
    from evolution_spark.io.delta_log import read_delta_snapshot

    table = tmp_path / "cmap"
    _write_column_mapped_table(spark, table, n=30)
    df = read_delta_snapshot(spark, str(table))
    assert df.columns == ["k", "v"]  # LOGICAL names
    got = {(r.k, r.v) for r in df.collect()}
    assert got == {(i, i * 10) for i in range(30)}
    # skip_where on the LOGICAL column translates to the physical stats
    assert read_delta_snapshot(
        spark, str(table), skip_where=[("k", ">", 100)]
    ).count() == 0  # file pruned via physical-name stats
    assert read_delta_snapshot(
        spark, str(table), skip_where=[("k", "<=", 5)]
    ).count() == 30  # file kept; predicate itself is the caller's job


def test_column_mapping_composes_with_dv(spark, tmp_path):
    from evolution_spark.io.delta_log import read_delta_snapshot

    table = tmp_path / "cmapdv"
    _write_column_mapped_table(spark, table, n=30, with_dv=True)
    df = read_delta_snapshot(spark, str(table))
    assert {r.k for r in df.collect()} == set(range(30)) - {0, 2, 4}
    assert df.columns == ["k", "v"]


def test_column_mapping_id_mode_and_writes_refused(spark, tmp_path):
    from evolution_spark.io.delta_log import (
        DeltaProtocolError,
        commit_delta,
        read_delta_snapshot,
    )

    table = tmp_path / "cmapid"
    _write_column_mapped_table(spark, table, n=5)
    log = table / "_delta_log"
    lines = (log / f"{0:020d}.json").read_text().splitlines()
    meta = json.loads(lines[1])
    meta["metaData"]["configuration"]["delta.columnMapping.mode"] = "id"
    lines[1] = json.dumps(meta)
    (log / f"{0:020d}.json").write_text("\n".join(lines) + "\n")
    # id-mode READS are supported (field-id resolution,
    # tests/test_delta_id_mode.py); WRITES into id-mode tables refuse —
    # this writer does not stamp footer field ids
    with pytest.raises(DeltaProtocolError, match="read-only"):
        commit_delta(
            spark.range(1).select(
                F.col("id").alias("k"), (F.col("id") * 10).alias("v")
            ),
            str(table),
            mode="append",
        )
    # writes to name-mode column-mapped tables are SUPPORTED: the append
    # lands under PHYSICAL names so every mapped reader resolves it
    meta["metaData"]["configuration"]["delta.columnMapping.mode"] = "name"
    lines[1] = json.dumps(meta)
    (log / f"{0:020d}.json").write_text("\n".join(lines) + "\n")
    df = spark.range(5, 8).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    commit_delta(df, str(table), mode="append")
    back = read_delta_snapshot(spark, str(table))
    assert back.columns == ["k", "v"]  # logical names
    assert {(r.k, r.v) for r in back.collect()} == {
        (i, i * 10) for i in range(8)
    }
    # the appended parquet files store physical names, not logical ones
    import pyarrow.parquet as papq

    fields = set()
    for p in table.glob("*.parquet"):
        fields |= set(papq.ParquetFile(p).schema_arrow.names)
    assert "k" not in fields and "v" not in fields


# --------------------------------------------------------------------------
# change-data-feed reader (table_changes)
# --------------------------------------------------------------------------


def test_table_changes_lifecycle(spark, tmp_path):
    """Inserts from appends, deletes from MOR DELETEs (DV bitmap diff),
    full-file deletes from overwrites, and NOTHING from dataChange=false
    OPTIMIZE rewrites."""
    from evolution_spark.io.delta_log import (
        commit_delta,
        delete_delta_rows,
        optimize_delta,
        table_changes,
        write_delta_snapshot,
    )

    path = str(tmp_path / "cdf")
    df0 = spark.range(0, 10).select(F.col("id").alias("k"))
    write_delta_snapshot(df0, path)  # v0
    commit_delta(
        spark.range(10, 16).select(F.col("id").alias("k")), path, mode="append"
    )  # v1
    delete_delta_rows(spark, path, "k % 5 = 0")  # v2: deletes 0,5,10,15
    optimize_delta(spark, path, target_files=1)  # v3: dataChange=false

    ch = table_changes(spark, path, 0)
    got = {(r.k, r._change_type, r._commit_version) for r in ch.collect()}
    expect = (
        {(k, "insert", 0) for k in range(10)}
        | {(k, "insert", 1) for k in range(10, 16)}
        | {(k, "delete", 2) for k in (0, 5, 10, 15)}
    )
    assert got == expect  # v3 (OPTIMIZE) contributes nothing

    # range narrowing: only v2's deletes
    ch2 = table_changes(spark, path, 2, 2)
    assert {(r.k, r._change_type) for r in ch2.collect()} == {
        (k, "delete") for k in (0, 5, 10, 15)
    }

    # overwrite -> full-file deletes of the LIVE rows + inserts of the new
    commit_delta(
        spark.range(100, 103).select(F.col("id").alias("k")),
        path, mode="overwrite",
    )  # v4
    ch3 = table_changes(spark, path, 4, 4)
    got3 = {(r.k, r._change_type) for r in ch3.collect()}
    live_before = {k for k in range(16) if k % 5 != 0}
    assert got3 == {(k, "delete") for k in live_before} | {
        (k, "insert") for k in (100, 101, 102)
    }


def test_table_changes_insert_excludes_existing_dv(spark, tmp_path):
    """A file added WITH a DV (foreign DELETE commit re-add) contributes
    inserts only for its live positions."""
    from evolution_spark.io.delta_log import table_changes

    table = tmp_path / "cdf_dv"
    _, deleted = _write_foreign_dv_table(spark, table, n=50)  # v1 = DELETE
    ch = table_changes(spark, str(table), 0)
    got = {(r.k, r._change_type, r._commit_version) for r in ch.collect()}
    expect = {(k, "insert", 0) for k in range(50)} | {
        (k, "delete", 1) for k in deleted
    }
    assert got == expect
    # consuming only v1 sees just the deletes
    ch1 = table_changes(spark, str(table), 1, 1)
    assert {(r.k, r._change_type) for r in ch1.collect()} == {
        (k, "delete") for k in deleted
    }


def test_table_changes_guards(spark, tmp_path):
    from evolution_spark.io.delta_log import table_changes, write_delta_snapshot

    path = str(tmp_path / "cdf_g")
    write_delta_snapshot(spark.range(3).select(F.col("id").alias("k")), path)
    with pytest.raises(ValueError, match="version range"):
        table_changes(spark, path, 0, 7)
    # empty change range -> empty frame with the full CDF schema
    out = table_changes(spark, path, 0, 0).where("_change_type = 'delete'")
    assert out.count() == 0
    assert out.columns == ["k", "_change_type", "_commit_version"]


def test_table_changes_column_mapped(spark, tmp_path):
    """CDF over a column-mapped table resolves physical names — without
    the mapping, every data column would come back NULL."""
    from evolution_spark.io.delta_log import table_changes

    table = tmp_path / "cdf_cmap"
    _write_column_mapped_table(spark, table, n=12, with_dv=True)
    ch = table_changes(spark, str(table), 0)
    rows = ch.collect()
    assert ch.columns == ["k", "v", "_change_type", "_commit_version"]
    assert all(r.k is not None and r.v is not None for r in rows)
    got = {(r.k, r.v, r._change_type) for r in rows}
    # v0: inserts of the NON-deleted positions (the add carries the DV)
    assert got == {(k, k * 10, "insert") for k in range(12) if k not in (0, 2, 4)}


def test_table_changes_readded_path_version_scoped_exclusions(spark, tmp_path):
    """A path removed and later re-added within the range must not leak
    one version's DV exclusions into the other version's rows."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    from evolution_spark.io.delta_log import table_changes

    table = tmp_path / "cdf_readd"
    table.mkdir(parents=True)
    name = f"part-{uuid.uuid4().hex}.parquet"
    papq.write_table(
        pa.table({"k": pa.array(range(6), pa.int64())}), table / name
    )
    schema_string = json.dumps({
        "type": "struct",
        "fields": [{"name": "k", "type": "long", "nullable": True,
                    "metadata": {}}],
    })
    log = table / "_delta_log"
    log.mkdir()
    desc = write_dv_file(table, [0])
    commits = [
        [  # v0: plain add (all 6 rows insert)
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["deletionVectors"],
                          "writerFeatures": ["deletionVectors"]}},
            {"metaData": {"id": str(uuid.uuid4()),
                          "format": {"provider": "parquet"},
                          "schemaString": schema_string,
                          "partitionColumns": [], "configuration": {},
                          "createdTime": 0}},
            {"add": {"path": name, "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
        ],
        [  # v1: full remove (all 6 rows delete)
            {"remove": {"path": name, "deletionTimestamp": 1,
                        "dataChange": True}},
        ],
        [  # v2: re-add with a DV on position 0 (5 rows insert)
            {"add": {"path": name, "partitionValues": {}, "size": 1,
                     "modificationTime": 2, "dataChange": True,
                     "deletionVector": desc}},
        ],
    ]
    for v, acts in enumerate(commits):
        (log / f"{v:020d}.json").write_text(
            "".join(json.dumps(a) + "\n" for a in acts)
        )
    ch = table_changes(spark, str(table), 0)
    got = sorted((r.k, r._change_type, r._commit_version) for r in ch.collect())
    expect = sorted(
        [(k, "insert", 0) for k in range(6)]
        + [(k, "delete", 1) for k in range(6)]
        + [(k, "insert", 2) for k in range(6) if k != 0]
    )
    # the v2 DV exclusion must NOT swallow row 0's v0 insert
    assert got == expect


def test_update_delta_rows_atomic_merge_on_read(spark, tmp_path):
    """UPDATE = ONE commit: DVs on the old row versions + an appended file
    of updated copies; untouched files keep their bytes; CDF shows
    delete+insert at the same version."""
    from evolution_spark.io.delta_log import (
        read_delta_snapshot,
        table_changes,
        update_delta_rows,
        write_delta_snapshot,
    )

    path = str(tmp_path / "mor_upd")
    df = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    ).repartition(4)
    write_delta_snapshot(df, path)
    data_files = sorted(Path(path).rglob("*.parquet"))
    mtimes = {p: p.stat().st_mtime_ns for p in data_files}

    res = update_delta_rows(spark, path, "k % 8 = 0", {"v": "v + 1"})
    assert res["updated_rows"] == 5
    # original files untouched; exactly one commit published
    assert all(p.stat().st_mtime_ns == mtimes[p] for p in data_files)
    assert res["version"] == 1

    back = read_delta_snapshot(spark, path)
    got = {(r.k, r.v) for r in back.collect()}
    assert got == {(k, k * 10 + 1 if k % 8 == 0 else k * 10) for k in range(40)}
    # CDF: delete+insert at the SAME version
    ch = table_changes(spark, path, 1, 1)
    by_type = {}
    for r in ch.collect():
        by_type.setdefault(r._change_type, set()).add((r.k, r.v))
        assert r._commit_version == 1
    assert by_type["delete"] == {(k, k * 10) for k in range(40) if k % 8 == 0}
    assert by_type["insert"] == {(k, k * 10 + 1) for k in range(40) if k % 8 == 0}

    # guards
    with pytest.raises(ValueError, match="unknown columns"):
        update_delta_rows(spark, path, "k = 1", {"nope": "1"})
    assert update_delta_rows(spark, path, "k > 999", {"v": "0"})["version"] is None


def test_update_composes_with_prior_deletes(spark, tmp_path):
    """UPDATE over a table with existing DVs: already-deleted rows never
    re-match, and the new DVs union with the old."""
    from evolution_spark.io.delta_log import (
        delete_delta_rows,
        read_delta_snapshot,
        update_delta_rows,
        write_delta_snapshot,
    )

    path = str(tmp_path / "mor_upd2")
    write_delta_snapshot(
        spark.range(30).select(F.col("id").alias("k"), F.lit(0).alias("v")), path
    )
    delete_delta_rows(spark, path, "k < 10")
    update_delta_rows(spark, path, "k % 2 = 0", {"v": "99"})
    got = {(r.k, r.v) for r in read_delta_snapshot(spark, path).collect()}
    assert got == {(k, 99 if k % 2 == 0 else 0) for k in range(10, 30)}


def test_update_refuses_invariant_tables(spark, tmp_path):
    """UPDATE on a table carrying delta.invariants VALIDATES the rewritten
    rows (round 9, d84d225): a violating update aborts naming the invariant
    and publishes nothing; a satisfying update commits."""
    import pathlib

    from evolution_spark.io.delta_log import (
        DeltaProtocolError,
        read_delta_snapshot,
        update_delta_rows,
        write_delta_snapshot,
    )

    path = str(tmp_path / "upd_inv")
    write_delta_snapshot(
        spark.range(1, 6).select(F.col("id").alias("k")), path
    )
    log = pathlib.Path(path) / "_delta_log"
    v0 = (log / f"{0:020d}.json").read_text().splitlines()
    meta = next(json.loads(l) for l in v0 if "metaData" in l)
    sch = json.loads(meta["metaData"]["schemaString"])
    sch["fields"][0]["metadata"] = {
        "delta.invariants": '{"expression":{"expression":"k > 0"}}'
    }
    meta["metaData"]["schemaString"] = json.dumps(sch)
    (log / f"{1:020d}.json").write_text(json.dumps(meta) + "\n")
    with pytest.raises(DeltaProtocolError,
                       match=r"column invariant 'invariant\(k\)'"):
        update_delta_rows(spark, path, "k = 1", {"k": "-1"})
    assert {r.k for r in read_delta_snapshot(spark, path).collect()} == \
        {1, 2, 3, 4, 5}  # aborted commit published nothing
    update_delta_rows(spark, path, "k = 1", {"k": "10"})  # satisfies k > 0
    assert {r.k for r in read_delta_snapshot(spark, path).collect()} == \
        {10, 2, 3, 4, 5}


def test_restore_delta_table_lifecycle(spark, tmp_path):
    """RESTORE undoes appends, MOR deletes (the DV revert re-adds the
    file with its OLD DV state), and schema evolution in one commit;
    history is preserved and the restore is itself restorable."""
    from pyspark.sql import types as T

    from evolution_spark.io.delta_log import (
        commit_delta,
        delete_delta_rows,
        evolve_delta_schema,
        read_delta_snapshot,
        restore_delta_table,
        write_delta_snapshot,
    )

    path = str(tmp_path / "restore")
    write_delta_snapshot(
        spark.range(10).select(F.col("id").alias("k")), path
    )  # v0
    commit_delta(
        spark.range(10, 14).select(F.col("id").alias("k")), path, mode="append"
    )  # v1
    delete_delta_rows(spark, path, "k % 2 = 0")  # v2 (+protocol upgrade)
    evolve_delta_schema(path, [("w", T.DoubleType())])  # v3
    assert read_delta_snapshot(spark, path).columns == ["k", "w"]

    res = restore_delta_table(path, 1)
    assert res["restored_to"] == 1 and res["files_reverted"] > 0
    back = read_delta_snapshot(spark, path)
    assert back.columns == ["k"]  # schema restored
    assert {r.k for r in back.collect()} == set(range(14))  # DVs reverted
    # the pre-restore state is still time-travel readable
    v3 = read_delta_snapshot(spark, path, version=3)
    assert {r.k for r in v3.collect()} == {k for k in range(14) if k % 2}
    # restore the restore
    res2 = restore_delta_table(path, 3)
    got = {r.k for r in read_delta_snapshot(spark, path).collect()}
    assert got == {k for k in range(14) if k % 2}
    # no-op restore
    from evolution_spark.io.delta_log import _replay_log
    latest = _replay_log(tmp_path / "restore")[3]
    assert restore_delta_table(path, latest)["version"] is None


def test_restore_refuses_vacuumed_target(spark, tmp_path):
    """A restore whose target files were VACUUMed refuses with the
    missing list instead of publishing adds that point at nothing."""
    import pytest as _pytest

    from evolution_spark.io.delta_log import (
        optimize_delta,
        read_delta_snapshot,
        restore_delta_table,
        vacuum_delta,
        write_delta_snapshot,
    )

    path = str(tmp_path / "restorevac")
    write_delta_snapshot(
        spark.range(8).select(F.col("id").alias("k")).repartition(2), path
    )  # v0
    optimize_delta(spark, path, target_files=1)  # v1 rewrites layout
    vacuum_delta(path, keep_versions=1)  # reclaims the v0 files
    with _pytest.raises(FileNotFoundError, match="reclaimed"):
        restore_delta_table(path, 0)
    assert read_delta_snapshot(spark, path).count() == 8  # table unharmed


def test_delta_check_constraints_lifecycle(spark, tmp_path):
    """ADD CONSTRAINT upgrades the protocol and every row-adding commit
    validates: violating appends/updates/merges abort WITHOUT publishing
    a version; pre-violated constraints refuse at ADD time; DROP lifts
    the obligation; mapped tables validate under logical names."""
    from evolution_spark.io.delta_log import (
        DeltaProtocolError,
        _replay_log,
        add_delta_constraint,
        commit_delta,
        drop_delta_constraint,
        merge_delta_cdc,
        read_delta_snapshot,
        rename_delta_column,
        update_delta_rows,
        write_delta_snapshot,
    )

    path = str(tmp_path / "chk")
    write_delta_snapshot(
        spark.range(10).selectExpr("id AS k", "id * 10 AS v"), path
    )
    with pytest.raises(DeltaProtocolError, match="existing row violates"):
        add_delta_constraint(spark, path, "v_big", "v >= 10")
    add_delta_constraint(spark, path, "v_nonneg", "v >= 0")
    latest_before = _replay_log(Path(path))[3]
    # violating append aborts, no version published
    with pytest.raises(DeltaProtocolError, match="v_nonneg"):
        commit_delta(
            spark.createDataFrame([(99, -5)], "k long, v long"),
            path, mode="append",
        )
    assert _replay_log(Path(path))[3] == latest_before
    # valid append passes
    commit_delta(
        spark.createDataFrame([(10, 100)], "k long, v long"),
        path, mode="append",
    )
    # violating UPDATE aborts
    with pytest.raises(DeltaProtocolError, match="v_nonneg"):
        update_delta_rows(spark, path, "k = 1", {"v": "-v"})
    # violating MERGE aborts (merge commits through commit_delta)
    with pytest.raises(DeltaProtocolError, match="v_nonneg"):
        merge_delta_cdc(
            spark, path,
            spark.createDataFrame([(2, -7, "u")], "k long, v long, _op string"),
            key="k",
        )
    assert {(r.k, r.v) for r in read_delta_snapshot(spark, path).collect()} == {
        (i, i * 10) for i in range(11)
    }
    # DROP lifts the obligation
    drop_delta_constraint(path, "v_nonneg")
    commit_delta(
        spark.createDataFrame([(11, -1)], "k long, v long"), path, mode="append"
    )
    assert read_delta_snapshot(spark, path).count() == 12


def test_delta_check_constraints_on_mapped_table(spark, tmp_path):
    """Constraint expressions are written in LOGICAL names; validation on
    a column-mapped table's physical staging output must realign."""
    from evolution_spark.io.delta_log import (
        DeltaProtocolError,
        add_delta_constraint,
        commit_delta,
        rename_delta_column,
        write_delta_snapshot,
    )

    path = str(tmp_path / "chkmap")
    write_delta_snapshot(
        spark.range(5).selectExpr("id AS k", "id * 10 AS v"),
        path, column_mapping=True,
    )
    rename_delta_column(path, "v", "val")
    add_delta_constraint(spark, path, "val_nonneg", "val >= 0")
    commit_delta(
        spark.createDataFrame([(5, 50)], "k long, val long"), path, mode="append"
    )
    with pytest.raises(DeltaProtocolError, match="val_nonneg"):
        commit_delta(
            spark.createDataFrame([(6, -1)], "k long, val long"),
            path, mode="append",
        )


def test_delta_sink_refuses_constraint_tables(spark, tmp_path):
    """The DataSource sink has no session to validate constraints with —
    it must refuse rather than commit unvalidated rows."""
    from evolution_spark.io.delta_log import (
        add_delta_constraint,
        write_delta_snapshot,
    )
    from evolution_spark.io.delta_source import register_delta_source

    register_delta_source(spark)
    path = str(tmp_path / "chksink")
    write_delta_snapshot(spark.range(3).selectExpr("id AS k"), path)
    add_delta_constraint(spark, path, "k_nonneg", "k >= 0")
    with pytest.raises(Exception, match="CHECK constraints"):
        spark.range(3, 5).selectExpr("id AS k").write.format(
            "evolution_delta"
        ).mode("append").save(path)


def test_foreign_writer_v3_table_now_writable(spark, tmp_path):
    """A foreign minWriterVersion=3 table (CHECK constraints era) is now
    writable — the obligation is enforced, so the protocol gate admits
    it."""
    from evolution_spark.io.delta_log import (
        DeltaProtocolError,
        commit_delta,
        read_delta_snapshot,
        write_delta_snapshot,
    )

    path = tmp_path / "v3t"
    write_delta_snapshot(spark.range(4).selectExpr("id AS k"), str(path))
    log = path / "_delta_log"
    lines = (log / f"{0:020d}.json").read_text().splitlines()
    fixed = []
    for ln in lines:
        a = json.loads(ln)
        if "protocol" in a:
            a["protocol"] = {"minReaderVersion": 1, "minWriterVersion": 3}
        if "metaData" in a:
            a["metaData"]["configuration"] = {
                "delta.constraints.k_pos": "k >= 0"
            }
        fixed.append(json.dumps(a))
    (log / f"{0:020d}.json").write_text("\n".join(fixed) + "\n")
    commit_delta(spark.range(4, 6).selectExpr("id AS k"), str(path), mode="append")
    assert read_delta_snapshot(spark, str(path)).count() == 6
    with pytest.raises(DeltaProtocolError, match="k_pos"):
        commit_delta(
            spark.createDataFrame([(-1,)], "k long"), str(path), mode="append"
        )
