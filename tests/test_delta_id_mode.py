"""Delta column-mapping **id** mode (delta.columnMapping.mode='id'):
resolution by parquet field id. Reference parity: the reference's Delta
target is todo!() (examples/delta/src/main.rs:28-30); this read path is
native capability beyond it, built on the public Delta PROTOCOL.md column
mapping rules + Spark's SPARK-38094 fieldId reader.

Fixture shape is the adversarial one id mode exists for: two file batches
whose PHYSICAL data-column names disagree, hive-partitioned under the
physical partition directory name. A name-resolving reader surfaces half
the table as null; a field-id reader reconstructs it exactly.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

import pytest
from pyspark.sql import functions as F


def _build_id_mode_table(spark, base, partitioned=True, mode="id"):
    """Hand-built foreign-style id-mode table over spark.range(20):
    k (id 1), v (id 2), seg (id 3, partition col when partitioned).
    Batch 'even' stores (col-even-k, col-even-v); batch 'odd' stores
    (col-odd-k, col-odd-v). Returns the table path."""
    tmp = base / "idmode"
    tmp.mkdir(parents=True, exist_ok=True)
    phys_seg = "col-seg-x"
    src = spark.range(20).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("seg"),
    )
    adds = []
    for tag, pred in (("even", "k % 4 < 2"), ("odd", "k % 4 >= 2")):
        out = src.where(pred).select(
            F.col("k").alias(f"col-{tag}-k"),
            F.col("v").alias(f"col-{tag}-v"),
            F.col("seg").alias(phys_seg),
        )
        out = out.withMetadata(f"col-{tag}-k", {"parquet.field.id": 1})
        out = out.withMetadata(f"col-{tag}-v", {"parquet.field.id": 2})
        stage = tmp / f"_stage_{tag}"
        w = out.coalesce(1).write.mode("overwrite")
        if partitioned:
            w = w.partitionBy(phys_seg)
        else:
            out = out.drop(phys_seg)
            w = out.coalesce(1).write.mode("overwrite")
        w.parquet(str(stage))
        for f in sorted(stage.rglob("*.parquet")):
            if partitioned:
                seg_dir = f.parent.name
                seg_val = seg_dir.partition("=")[2]
                dest_dir = tmp / seg_dir
                rel_prefix = f"{seg_dir}/"
                pv = {phys_seg: seg_val}
            else:
                dest_dir = tmp
                rel_prefix = ""
                pv = {}
            dest_dir.mkdir(exist_ok=True)
            name = f"part-{uuid.uuid4().hex}.parquet"
            os.replace(f, dest_dir / name)
            adds.append({"add": {
                "path": f"{rel_prefix}{name}", "partitionValues": pv,
                "size": (dest_dir / name).stat().st_size,
                "modificationTime": 0, "dataChange": True,
            }})
    fields = [
        {"name": "k", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-even-k"}},
        {"name": "v", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-even-v"}},
    ]
    if partitioned:
        fields.append(
            {"name": "seg", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 3,
                          "delta.columnMapping.physicalName": phys_seg}}
        )
    v0 = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["columnMapping"],
                      "writerFeatures": ["columnMapping"]}},
        {"metaData": {"id": str(uuid.uuid4()),
                      "format": {"provider": "parquet"},
                      "schemaString": json.dumps(
                          {"type": "struct", "fields": fields}),
                      "partitionColumns": [phys_seg] if partitioned else [],
                      "configuration": {"delta.columnMapping.mode": mode},
                      "createdTime": 0}},
    ] + adds
    log = tmp / "_delta_log"
    log.mkdir(exist_ok=True)
    (log / f"{0:020d}.json").write_text(
        "".join(json.dumps(a) + "\n" for a in v0)
    )
    return str(tmp)


def _expected():
    return sorted(
        (k, k * 10, "a" if k % 2 == 0 else "b") for k in range(20)
    )


def test_id_mode_read_resolves_by_field_id(spark, tmp_path):
    from evolution_spark.io.delta_log import read_delta_snapshot

    path = _build_id_mode_table(spark, tmp_path)
    back = read_delta_snapshot(spark, path)
    assert back.columns == ["k", "v", "seg"]
    got = sorted((r.k, r.v, r.seg) for r in back.collect())
    assert got == _expected()


def test_id_mode_read_unpartitioned(spark, tmp_path):
    from evolution_spark.io.delta_log import read_delta_snapshot

    path = _build_id_mode_table(spark, tmp_path, partitioned=False)
    back = read_delta_snapshot(spark, path)
    assert back.columns == ["k", "v"]
    got = sorted((r.k, r.v) for r in back.collect())
    assert got == [(k, k * 10) for k in range(20)]


def test_id_mode_python_source_read(spark, tmp_path):
    from evolution_spark.io.delta_source import register_delta_source

    register_delta_source(spark)
    path = _build_id_mode_table(spark, tmp_path)
    back = spark.read.format("evolution_delta").load(path)
    got = sorted((r.k, r.v, r.seg) for r in back.collect())
    assert got == _expected()


def test_id_mode_table_changes(spark, tmp_path):
    from evolution_spark.io.delta_log import table_changes

    path = _build_id_mode_table(spark, tmp_path)
    ch = table_changes(spark, path, 0)
    rows = ch.collect()
    assert all(r._change_type == "insert" for r in rows)
    got = sorted((r.k, r.v, r.seg) for r in rows)
    assert got == _expected()


def test_id_mode_write_refuses(spark, tmp_path):
    from evolution_spark.io.delta_log import DeltaProtocolError, commit_delta

    path = _build_id_mode_table(spark, tmp_path)
    extra = spark.range(1).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("v"),
        F.lit("a").alias("seg"),
    )
    with pytest.raises(DeltaProtocolError, match="read-only"):
        commit_delta(extra, path, mode="append")


def test_id_mode_missing_field_id_refuses(spark, tmp_path):
    from evolution_spark.io.delta_log import (
        DeltaProtocolError,
        field_id_scan_schema,
    )

    schema_json = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
    ]}
    with pytest.raises(DeltaProtocolError, match="delta.columnMapping.id"):
        field_id_scan_schema(schema_json, [])


def test_unknown_mapping_mode_refuses():
    from evolution_spark.io.delta_log import DeltaProtocolError, mapping_mode

    with pytest.raises(DeltaProtocolError, match="spec mode"):
        mapping_mode({"delta.columnMapping.mode": "uuid"})
    assert mapping_mode({}) == "none"
    assert mapping_mode({"delta.columnMapping.mode": "id"}) == "id"


def test_id_mode_nested_struct_refuses():
    from evolution_spark.io.delta_log import (
        DeltaProtocolError,
        field_id_scan_schema,
    )

    schema_json = {"type": "struct", "fields": [
        {"name": "s", "nullable": True,
         "type": {"type": "struct", "fields": []},
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-s"}},
    ]}
    with pytest.raises(DeltaProtocolError, match="nested struct"):
        field_id_scan_schema(schema_json, [])


def test_id_mode_delete_refuses_up_front(spark, tmp_path):
    """Regression (round-8 review): DELETE on an id-mode table must hit
    the shared read-only refusal BEFORE any DV file lands on disk."""
    from evolution_spark.io.delta_log import DeltaProtocolError, delete_delta_rows

    path = _build_id_mode_table(spark, tmp_path)
    with pytest.raises(DeltaProtocolError, match="read-only"):
        delete_delta_rows(spark, path, "k = 1")
    assert not list(Path(path).rglob("deletion_vector_*.bin"))
