"""Column mapping over NESTED STRUCTS (name mode) — the shape a foreign
table gets after renaming a struct's inner field: parquet files store
physical names at EVERY nesting level, the schema metadata maps each
level back, and the scan aliases flat fields and positionally CASTS
struct-bearing ones (a cast renames at all depths and keeps null structs
null). Built on the public Delta PROTOCOL.md column-mapping rules.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from evolution_spark.io.delta_log import (
    read_delta_snapshot,
    rename_delta_column,
    write_delta_snapshot,
)


def _build_nested_mapped_table(spark, base):
    """Foreign-style table: k (long), s struct<a: long, b: string> —
    every field (incl. s.a / s.b) renamed to col-* physical names; one
    row carries a NULL struct."""
    tmp = base / "nestedmap"
    tmp.mkdir(parents=True, exist_ok=True)
    src = spark.range(10).select(
        F.col("id").alias("k"),
        F.when(
            F.col("id") % 5 != 4,
            F.struct(
                (F.col("id") * 100).alias("col-sa"),
                F.concat(F.lit("v"), F.col("id")).alias("col-sb"),
            ),
        ).alias("col-s"),
    ).withColumnRenamed("k", "col-k")
    stage = tmp / "_stage"
    src.coalesce(2).write.mode("overwrite").parquet(str(stage))
    adds = []
    for f in sorted(stage.rglob("*.parquet")):
        name = f"part-{uuid.uuid4().hex}.parquet"
        os.replace(f, tmp / name)
        adds.append({"add": {
            "path": name, "partitionValues": {},
            "size": (tmp / name).stat().st_size,
            "modificationTime": 0, "dataChange": True,
        }})
    fields = [
        {"name": "k", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-k"}},
        {"name": "s", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-s"},
         "type": {"type": "struct", "fields": [
             {"name": "a", "type": "long", "nullable": True,
              "metadata": {"delta.columnMapping.id": 3,
                           "delta.columnMapping.physicalName": "col-sa"}},
             {"name": "b", "type": "string", "nullable": True,
              "metadata": {"delta.columnMapping.id": 4,
                           "delta.columnMapping.physicalName": "col-sb"}},
         ]}},
    ]
    v0 = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["columnMapping"],
                      "writerFeatures": ["columnMapping"]}},
        {"metaData": {"id": str(uuid.uuid4()),
                      "format": {"provider": "parquet"},
                      "schemaString": json.dumps(
                          {"type": "struct", "fields": fields}),
                      "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": "name"},
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
        (k, None if k % 5 == 4 else (k * 100, f"v{k}")) for k in range(10)
    )


def test_nested_mapped_read(spark, tmp_path):
    from evolution_spark.io.delta_log import read_delta_snapshot

    path = _build_nested_mapped_table(spark, tmp_path)
    back = read_delta_snapshot(spark, path)
    assert back.columns == ["k", "s"]
    assert [f.name for f in back.schema["s"].dataType.fields] == ["a", "b"]
    got = sorted(
        (r.k, None if r.s is None else (r.s.a, r.s.b)) for r in back.collect()
    )
    # NULL structs stay null (a rebuilt F.struct would have produced
    # struct(null, null) instead)
    assert got == _expected()


def test_nested_mapped_table_changes(spark, tmp_path):
    from evolution_spark.io.delta_log import table_changes

    path = _build_nested_mapped_table(spark, tmp_path)
    ch = table_changes(spark, path, 0)
    rows = ch.collect()
    assert all(r._change_type == "insert" for r in rows)
    got = sorted(
        (r.k, None if r.s is None else (r.s.a, r.s.b)) for r in rows
    )
    assert got == _expected()


def test_nested_mapped_dml_roundtrip(spark, tmp_path):
    """DELETE (DV) and UPDATE (physicalized rewrite via struct cast) on a
    nested-mapped table: the new files must store PHYSICAL nested names
    so the mapped read keeps resolving them."""
    import pyarrow.parquet as papq

    from evolution_spark.io.delta_log import (
        delete_delta_rows,
        read_delta_snapshot,
        update_delta_rows,
    )

    path = _build_nested_mapped_table(spark, tmp_path)
    delete_delta_rows(spark, path, "k % 5 = 0")
    back = read_delta_snapshot(spark, path)
    assert back.where(F.col("k").isin(0, 5)).count() == 0
    assert back.count() == 8

    update_delta_rows(spark, path, "k = 1", {"k": "k + 100"})
    back = read_delta_snapshot(spark, path)
    row = back.where(F.col("k") == 101).collect()
    assert len(row) == 1 and row[0].s.a == 100 and row[0].s.b == "v1"
    # the rewrite's files store physical nested names
    names = set()
    for p in Path(path).glob("*.parquet"):
        sch = papq.ParquetFile(p).schema_arrow
        for fld in sch:
            names.add(fld.name)
            if hasattr(fld.type, "num_fields") and fld.type.num_fields:
                for i in range(fld.type.num_fields):
                    names.add(fld.type.field(i).name)
    assert "col-sa" in names and "a" not in names


def test_nested_mapped_python_source_matches_library(spark, tmp_path):
    """The arrow-side DataSource resolves nested mapped structs since
    round 9 (recursive physical-name renames per file) — it must agree
    with the library reader exactly on a foreign-built nested table."""
    from evolution_spark.io.delta_source import register_delta_source

    register_delta_source(spark)
    path = _build_nested_mapped_table(spark, tmp_path)
    got = spark.read.format("evolution_delta").load(path)
    lib = read_delta_snapshot(spark, path)
    # simpleString: nullability at nesting levels differs by construction
    assert got.schema.simpleString() == lib.schema.simpleString()
    assert sorted(map(str, got.collect())) == sorted(map(str, lib.collect()))


def test_upgrade_and_nested_rename_drop_on_own_table(spark, tmp_path):
    """Round-8 write-side symmetry: upgrading a table CONTAINING structs
    stamps ids/physicalNames at every level (metadata-only), after which
    inner members rename/drop by dotted path — old files keep resolving
    through the stored physical names, time travel sees the old names."""
    from evolution_spark.io.delta_log import (
        commit_delta,
        drop_delta_column,
        read_delta_snapshot,
        rename_delta_column,
        upgrade_delta_to_column_mapping,
        write_delta_snapshot,
    )

    path = str(tmp_path / "ownnested")
    df = spark.range(8).select(
        F.col("id").alias("k"),
        F.struct(
            (F.col("id") * 2).alias("a"),
            F.concat(F.lit("x"), F.col("id")).alias("b"),
        ).alias("s"),
    )
    write_delta_snapshot(df, path)
    up = upgrade_delta_to_column_mapping(path)
    assert up["mode"] == "name"
    # maxColumnId counts nested members too (k, s, s.a, s.b)
    import json as _json

    lines = (Path(path) / "_delta_log" / f"{1:020d}.json").read_text()
    meta = next(_json.loads(l)["metaData"] for l in lines.splitlines()
                if "metaData" in l)
    assert meta["configuration"]["delta.columnMapping.maxColumnId"] == "4"

    rename_delta_column(path, "s.b", "label")
    back = read_delta_snapshot(spark, path)
    assert [f.name for f in back.schema["s"].dataType.fields] == ["a", "label"]
    assert sorted((r.k, r.s.a, r.s.label) for r in back.collect()) == [
        (i, i * 2, f"x{i}") for i in range(8)
    ]
    # time travel to pre-rename sees the old inner name
    old = read_delta_snapshot(spark, path, version=1)
    assert [f.name for f in old.schema["s"].dataType.fields] == ["a", "b"]

    # append post-rename: physical inner names land in the new files
    commit_delta(
        spark.range(8, 10).select(
            F.col("id").alias("k"),
            F.struct((F.col("id") * 2).alias("a"),
                     F.concat(F.lit("x"), F.col("id")).alias("label")).alias("s"),
        ),
        path, mode="append",
    )
    assert read_delta_snapshot(spark, path).count() == 10

    drop_delta_column(path, "s.a")
    back2 = read_delta_snapshot(spark, path)
    assert [f.name for f in back2.schema["s"].dataType.fields] == ["label"]
    assert sorted(r.s.label for r in back2.collect()) == sorted(
        f"x{i}" for i in range(10)
    )
    # dropping the last member refuses with guidance
    import pytest as _pytest

    with _pytest.raises(ValueError, match="last member"):
        drop_delta_column(path, "s.label")
    with _pytest.raises(ValueError, match="not found"):
        rename_delta_column(path, "s.nope", "x")


def test_nested_mapped_cdf_sidecars(spark, tmp_path):
    """Regression (round-8 review pass 2): CDF sidecars on a
    nested-mapped table must physicalize INNER struct fields too — a
    flat-rename sidecar stores inner fields under logical names and
    every mapped change reader resolves them as null."""
    from evolution_spark.io.delta_log import (
        rename_delta_column,
        table_changes,
        update_delta_rows,
        upgrade_delta_to_column_mapping,
        write_delta_snapshot,
    )

    path = str(tmp_path / "nestedcdf")
    df = spark.range(6).select(
        F.col("id").alias("k"),
        F.struct((F.col("id") * 10.0).alias("bal"),
                 F.concat(F.lit("s"), F.col("id")).alias("seg")).alias("s"),
    )
    write_delta_snapshot(
        df, path, configuration={"delta.enableChangeDataFeed": "true"}
    )
    upgrade_delta_to_column_mapping(path)
    rename_delta_column(path, "s.bal", "balance")  # inner phys != logical
    res = update_delta_rows(spark, path, "k = 2", {"k": "k + 100"})
    ch = table_changes(spark, path, res["version"])
    got = sorted(
        (r.k, r.s.balance, r.s.seg, r._change_type) for r in ch.collect()
    )
    assert got == [
        (2, 20.0, "s2", "update_preimage"),
        (102, 20.0, "s2", "update_postimage"),
    ]


# --- round 9: nested mapping on the evolution_delta DataSource path ---


def _mounted(spark, path):
    from evolution_spark.io.delta_source import register_delta_source

    register_delta_source(spark)
    return spark.read.format("evolution_delta").load(path)


def _nested_df(spark, n=12):
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.struct(
            (F.col("id") * 10.0).alias("bal"),
            F.concat(F.lit("s"), F.col("id") % 3).alias("seg"),
            F.struct((F.col("id") % 7).alias("tag")).alias("inner"),
        ).alias("s"),
        F.array(F.struct((F.col("id") % 5).alias("q"))).alias("arr"),
    )


def test_source_nested_rename_zero_copy_view(spark, tmp_path):
    """Pure nested renames resolve on the DataSource path and agree with
    the library reader bit-for-bit."""
    path = str(tmp_path / "srcnested")
    write_delta_snapshot(_nested_df(spark), path, column_mapping=True)
    rename_delta_column(path, "s.bal", "balance")
    rename_delta_column(path, "s.inner.tag", "ticket")
    got = _mounted(spark, path)
    assert dict(got.dtypes)["s"].startswith("struct<balance:")
    lib = read_delta_snapshot(spark, path)
    assert sorted(map(str, got.collect())) == sorted(map(str, lib.collect()))
    r0 = got.orderBy("k").first()
    assert r0.s.balance == 0.0 and r0.s.inner.ticket == 0 and r0.arr[0].q == 0


def test_source_nested_drop_restructures_old_files(spark, tmp_path):
    """Files written before a nested DROP carry the extra member; the
    executor rebuild selects it away (and never resurrects it on re-add)."""
    from pyspark.sql.types import StringType

    from evolution_spark.io.delta_log import drop_delta_column, evolve_delta_schema

    path = str(tmp_path / "srcdrop")
    write_delta_snapshot(_nested_df(spark), path, column_mapping=True)
    drop_delta_column(path, "s.seg")
    evolve_delta_schema(path, [("note", StringType())])  # top-level add: nulls
    got = _mounted(spark, path)
    assert "seg" not in dict(got.dtypes)["s"]
    assert got.where(F.col("note").isNull()).count() == 12
    lib = read_delta_snapshot(spark, path)
    assert sorted(map(str, got.collect())) == sorted(map(str, lib.collect()))


def test_source_nested_dv_mask_composes(spark, tmp_path):
    from evolution_spark.io.delta_log import delete_delta_rows

    path = str(tmp_path / "srcdv")
    write_delta_snapshot(_nested_df(spark), path, column_mapping=True)
    rename_delta_column(path, "s.bal", "balance")
    delete_delta_rows(spark, path, "k % 4 = 0")
    got = _mounted(spark, path)
    assert {r.k for r in got.select("k").collect()} == {
        i for i in range(12) if i % 4 != 0
    }


def test_source_id_mode_still_refuses_nested(spark, tmp_path):
    """id-mode field ids resolve flat only — the nested refusal survives
    there (and names the shape)."""
    import json as _json
    from pathlib import Path

    import pytest as _pytest

    from evolution_spark.io.delta_log import DeltaProtocolError

    path = str(tmp_path / "srcid")
    write_delta_snapshot(_nested_df(spark), path, column_mapping=True)
    log = Path(path) / "_delta_log"
    lines = (log / f"{0:020d}.json").read_text().splitlines()
    out = []
    for ln in lines:
        a = _json.loads(ln)
        if "metaData" in a:
            a["metaData"]["configuration"]["delta.columnMapping.mode"] = "id"
        out.append(_json.dumps(a))
    (log / f"{0:020d}.json").write_text("\n".join(out) + "\n")
    # the raise happens inside Spark's DataSource planning worker, so it
    # surfaces wrapped — match on the message, not the exception type
    with _pytest.raises(Exception, match="nested"):
        _mounted(spark, path).collect()


def test_conform_view_type_shape_mismatch_returns_none():
    """_logical_view_type bails (-> rebuild path) on member-count or
    order divergence instead of mis-renaming positionally."""
    import pyarrow as pa

    from evolution_spark.io.delta_source import _logical_view_type

    t_json = {
        "type": "struct",
        "fields": [
            {"name": "a", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.physicalName": "p_a"}},
            {"name": "b", "type": "double", "nullable": True,
             "metadata": {"delta.columnMapping.physicalName": "p_b"}},
        ],
    }
    ok = pa.struct([("p_a", pa.int64()), ("p_b", pa.float64())])
    assert _logical_view_type(ok, t_json) == pa.struct(
        [("a", pa.int64()), ("b", pa.float64())]
    )
    extra = pa.struct(
        [("p_a", pa.int64()), ("p_b", pa.float64()), ("p_c", pa.int32())]
    )
    assert _logical_view_type(extra, t_json) is None
    swapped = pa.struct([("p_b", pa.float64()), ("p_a", pa.int64())])
    assert _logical_view_type(swapped, t_json) is None


def test_conform_add_drop_under_array_rebuilds():
    """Round 10: member add/drop UNDER array elements rebuilds the child
    struct REUSING the stored offsets (was a refusal before — see
    test_source_member_add_drop_under_array_and_map for the end-to-end
    leg)."""
    import pyarrow as pa

    from evolution_spark.io.delta_source import _conform_column

    f_json = {
        "name": "arr",
        "type": {
            "type": "array",
            "elementType": {
                "type": "struct",
                "fields": [
                    {"name": "q", "type": "long", "nullable": True,
                     "metadata": {"delta.columnMapping.physicalName": "p_q"}},
                ],
            },
            "containsNull": True,
        },
        "nullable": True,
        "metadata": {},
    }
    stored = pa.array(
        [[{"p_q": 1, "p_gone": 2}], None, [{"p_q": 7, "p_gone": 8},
                                           {"p_q": 9, "p_gone": 10}]],
        type=pa.list_(pa.struct([("p_q", pa.int64()), ("p_gone", pa.int64())])),
    )
    out = _conform_column(stored, f_json)
    assert out.to_pylist() == [[{"q": 1}], None, [{"q": 7}, {"q": 9}]]


def _build_container_evolved_table(spark, base):
    """Foreign mapped table whose ARRAY/MAP element structs EVOLVED after
    the files were written: files store arr: array<struct<col-pa, col-pb>>
    and m: map<string, struct<col-mx>>; the logical schema renames
    arr.element.a->alpha, DROPS arr.element.b, ADDS arr.element.c (never
    stored), and renames m.value.x->xx. The round-10 reader rebuilds the
    element structs REUSING the stored offsets."""
    tmp = base / "containermap"
    tmp.mkdir(parents=True, exist_ok=True)
    src = spark.range(8).select(
        F.col("id").alias("col-k"),
        F.when(
            F.col("id") % 4 != 3,
            F.array(
                F.struct((F.col("id") * 2).alias("col-pa"),
                         F.concat(F.lit("b"), F.col("id")).alias("col-pb")),
                F.struct((F.col("id") * 2 + 1).alias("col-pa"),
                         F.lit("z").alias("col-pb")),
            ),
        ).alias("col-arr"),
        F.create_map(
            F.lit("m1"),
            F.struct((F.col("id") % 3).alias("col-mx")),
        ).alias("col-m"),
    )
    stage = tmp / "_stage"
    src.coalesce(2).write.mode("overwrite").parquet(str(stage))
    adds = []
    for f in sorted(stage.rglob("*.parquet")):
        name = f"part-{uuid.uuid4().hex}.parquet"
        os.replace(f, tmp / name)
        adds.append({"add": {
            "path": name, "partitionValues": {},
            "size": (tmp / name).stat().st_size,
            "modificationTime": 0, "dataChange": True,
        }})
    fields = [
        {"name": "k", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-k"}},
        {"name": "arr", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-arr"},
         "type": {"type": "array", "containsNull": True,
                  "elementType": {"type": "struct", "fields": [
                      {"name": "alpha", "type": "long", "nullable": True,
                       "metadata": {
                           "delta.columnMapping.id": 3,
                           "delta.columnMapping.physicalName": "col-pa"}},
                      # "b" (col-pb) DROPPED from the logical schema;
                      # "c" ADDED later — no stored data, nulls expected
                      {"name": "c", "type": "long", "nullable": True,
                       "metadata": {
                           "delta.columnMapping.id": 5,
                           "delta.columnMapping.physicalName": "col-pc"}},
                  ]}}},
        {"name": "m", "nullable": True,
         "metadata": {"delta.columnMapping.id": 6,
                      "delta.columnMapping.physicalName": "col-m"},
         "type": {"type": "map", "keyType": "string",
                  "valueContainsNull": True,
                  "valueType": {"type": "struct", "fields": [
                      {"name": "xx", "type": "long", "nullable": True,
                       "metadata": {
                           "delta.columnMapping.id": 7,
                           "delta.columnMapping.physicalName": "col-mx"}},
                  ]}}},
    ]
    v0 = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["columnMapping"],
                      "writerFeatures": ["columnMapping"]}},
        {"metaData": {"id": str(uuid.uuid4()),
                      "format": {"provider": "parquet"},
                      "schemaString": json.dumps(
                          {"type": "struct", "fields": fields}),
                      "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": "name"},
                      "createdTime": 0}},
    ] + adds
    log = tmp / "_delta_log"
    log.mkdir(exist_ok=True)
    (log / f"{0:020d}.json").write_text(
        "".join(json.dumps(a) + "\n" for a in v0)
    )
    return str(tmp)


def test_source_member_add_drop_under_array_and_map(spark, tmp_path):
    """Round 10: member add/drop under array/map elements rebuilds on the
    evolution_delta arrow path (stored offsets reused) and agrees with
    the library reader row-for-row, null arrays preserved."""
    t = _build_container_evolved_table(spark, tmp_path)
    lib = read_delta_snapshot(spark, t)
    src = _mounted(spark, t)
    # types must agree exactly; top-level field METADATA differs by design
    # (the source keeps columnMapping metadata, the library strips it)
    assert [(f.name, f.dataType) for f in src.schema.fields] == \
        [(f.name, f.dataType) for f in lib.schema.fields]

    def norm(df):
        return sorted(
            (r.k,
             None if r.arr is None else
             tuple((e.alpha, e.c) for e in r.arr),
             None if r.m is None else
             tuple(sorted((mk, mv.xx) for mk, mv in r.m.items())))
            for r in df.collect()
        )

    got = norm(src)
    assert got == norm(lib)
    want = sorted(
        (k,
         None if k % 4 == 3 else ((k * 2, None), (k * 2 + 1, None)),
         (("m1", k % 3),))
        for k in range(8)
    )
    assert got == want
