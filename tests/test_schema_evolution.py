"""ADD COLUMN schema evolution on the native Delta and Iceberg writers:
metadata-only commits widen the schema, old files scan as null in the new
columns, evolved appends round-trip, and time travel sees the schema that
was current at each version/snapshot."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_delta_add_column_roundtrip(spark, tmp_path):
    from evolution_spark.io.delta_log import (
        commit_delta,
        evolve_delta_schema,
        read_delta_snapshot,
        write_delta_snapshot,
    )

    path = str(tmp_path / "devolve")
    df0 = spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    write_delta_snapshot(df0, path)

    res = evolve_delta_schema(
        path, [("w", T.DoubleType()), ("tag", T.StringType())]
    )
    assert res["schema"] == ["k", "v", "w", "tag"]

    # pre-evolution schema still refuses (commit validates vs metaData)
    with pytest.raises(ValueError, match="schema mismatch"):
        commit_delta(df0, path, mode="append")

    df1 = spark.range(10, 15).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
        (F.col("id") * 1.5).alias("w"), F.lit("new").alias("tag"),
    )
    commit_delta(df1, path, mode="append")

    back = read_delta_snapshot(spark, path)
    assert back.columns == ["k", "v", "w", "tag"]
    assert back.count() == 15
    # old files scan as null in the added columns
    assert back.where("k < 10 AND w IS NULL AND tag IS NULL").count() == 10
    assert back.where("k >= 10 AND tag = 'new'").count() == 5
    got = {(r.k, r.w) for r in back.where("k >= 10").collect()}
    assert got == {(k, k * 1.5) for k in range(10, 15)}

    # time travel to v0 replays the OLD metaData -> old schema
    v0 = read_delta_snapshot(spark, path, version=0)
    assert v0.columns == ["k", "v"] and v0.count() == 10


def test_delta_evolution_guards_and_checkpoint(spark, tmp_path):
    from evolution_spark.io.delta_log import (
        checkpoint_delta,
        evolve_delta_schema,
        read_delta_snapshot,
        write_delta_snapshot,
    )

    path = str(tmp_path / "devolve2")
    df = spark.range(5).select(F.col("id").alias("k"))
    write_delta_snapshot(df, path)
    with pytest.raises(ValueError, match="already exists"):
        evolve_delta_schema(path, [("K", T.LongType())])  # case-insensitive
    with pytest.raises(TypeError, match="DataType"):
        evolve_delta_schema(path, [("x", "double")])
    with pytest.raises(ValueError, match="non-empty"):
        evolve_delta_schema(path, [])

    evolve_delta_schema(path, [("x", T.LongType())])
    # checkpoints carry the evolved metaData
    checkpoint_delta(path)
    back = read_delta_snapshot(spark, path)
    assert back.columns == ["k", "x"]
    assert back.where("x IS NULL").count() == 5


def test_iceberg_add_column_roundtrip(spark, tmp_path):
    from evolution_spark.io.iceberg_meta import (
        append_iceberg_snapshot,
        evolve_iceberg_schema,
        read_iceberg_table,
        write_iceberg_table,
    )

    path = str(tmp_path / "ievolve")
    df0 = spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    s0 = write_iceberg_table(df0, path)

    res = evolve_iceberg_schema(path, [("w", "double"), ("tag", "string")])
    assert res["schema"] == ["k", "v", "w", "tag"]
    # fresh field-ids: last-column-id advanced past the original 2
    assert res["last-column-id"] == 4

    df1 = spark.range(10, 15).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
        (F.col("id") * 1.5).alias("w"), F.lit("new").alias("tag"),
    )
    s1 = append_iceberg_snapshot(df1, path)

    back = read_iceberg_table(spark, path)
    assert back.columns == ["k", "v", "w", "tag"]
    assert back.count() == 15
    assert back.where("k < 10 AND w IS NULL AND tag IS NULL").count() == 10
    got = {(r.k, r.w, r.tag) for r in back.where("k >= 10").collect()}
    assert got == {(k, k * 1.5, "new") for k in range(10, 15)}

    # time travel to the pre-evolution snapshot reads its recorded schema
    old = read_iceberg_table(spark, path, snapshot_id=s0["snapshot-id"])
    assert old.columns == ["k", "v"] and old.count() == 10
    # the post-evolution snapshot reads the evolved schema
    assert read_iceberg_table(
        spark, path, snapshot_id=s1["snapshot-id"]
    ).columns == ["k", "v", "w", "tag"]


def test_iceberg_evolution_guards(spark, tmp_path):
    from evolution_spark.io.iceberg_meta import (
        evolve_iceberg_schema,
        write_iceberg_table,
    )

    path = str(tmp_path / "ievolve2")
    write_iceberg_table(
        spark.range(3).select(F.col("id").alias("k")), path
    )
    with pytest.raises(ValueError, match="already exists"):
        evolve_iceberg_schema(path, [("K", "long")])
    with pytest.raises(TypeError, match="unsupported iceberg type"):
        evolve_iceberg_schema(path, [("x", "uuid")])
    with pytest.raises(ValueError, match="non-empty"):
        evolve_iceberg_schema(path, [])


# --------------------------------------------------------------------------
# column mapping write + RENAME/DROP COLUMN (metadata-only evolution)
# --------------------------------------------------------------------------


def test_delta_column_mapping_write_and_rename_drop(spark, tmp_path):
    """Native mapped write -> metadata-only RENAME -> append under the new
    name -> DML -> DROP -> re-ADD with the same name; every step reads
    back correctly and time travel shows each historical schema."""
    from pyspark.sql import types as T

    from evolution_spark.io.delta_log import (
        commit_delta,
        delete_delta_rows,
        drop_delta_column,
        evolve_delta_schema,
        read_delta_snapshot,
        rename_delta_column,
        update_delta_rows,
        write_delta_snapshot,
    )

    path = str(tmp_path / "cmw")
    write_delta_snapshot(
        spark.range(10).select(F.col("id").alias("k"),
                               (F.col("id") * 10).alias("v")),
        path, column_mapping=True,
    )
    # files store physical names
    import pyarrow.parquet as papq

    for p in (tmp_path / "cmw").glob("*.parquet"):
        assert all(n.startswith("col-")
                   for n in papq.ParquetFile(p).schema_arrow.names)
    rename_delta_column(path, "v", "val")  # v1: metadata only
    df = read_delta_snapshot(spark, path)
    assert df.columns == ["k", "val"]
    assert {(r.k, r.val) for r in df.collect()} == {(i, i * 10)
                                                    for i in range(10)}
    # append under the NEW logical name (lands under the old physical one)
    commit_delta(
        spark.range(10, 13).select(F.col("id").alias("k"),
                                   (F.col("id") * 10).alias("val")),
        path, mode="append",
    )
    # merge-on-read DML over the mapped table (logical-name predicates)
    delete_delta_rows(spark, path, "k % 2 = 0")
    update_delta_rows(spark, path, "k = 3", {"val": "val + 1"})
    got = {(r.k, r.val) for r in read_delta_snapshot(spark, path).collect()}
    assert got == {(i, i * 10 + (1 if i == 3 else 0))
                   for i in range(13) if i % 2 == 1}
    drop_delta_column(path, "val")
    assert read_delta_snapshot(spark, path).columns == ["k"]
    # re-added name gets a FRESH physical column: dropped data cannot
    # resurrect
    evolve_delta_schema(path, [("val", T.LongType())])
    assert all(r.val is None
               for r in read_delta_snapshot(spark, path).collect())
    # time travel replays each version's metaData
    v0 = read_delta_snapshot(spark, path, version=0)
    assert v0.columns == ["k", "v"] and v0.count() == 10


def test_delta_mapping_upgrade_and_rename_chain(spark, tmp_path):
    """Upgrading an existing table keeps physical names equal to the old
    logical names (no file rewrite); a rename chain that reuses a freed
    logical name still resolves correctly (atomic projection, not
    sequential renames)."""
    from evolution_spark.io.delta_log import (
        read_delta_snapshot,
        rename_delta_column,
        upgrade_delta_to_column_mapping,
        write_delta_snapshot,
    )

    path = str(tmp_path / "cmu")
    write_delta_snapshot(
        spark.range(5).select(F.col("id").alias("a"),
                              (F.col("id") * 2).alias("b")),
        path,
    )
    assert upgrade_delta_to_column_mapping(path)["mode"] == "name"
    assert upgrade_delta_to_column_mapping(path)["version"] is None  # idempotent
    rename_delta_column(path, "a", "key")
    rename_delta_column(path, "b", "a")  # 'a' is free again
    df = read_delta_snapshot(spark, path)
    assert df.columns == ["key", "a"]
    assert {(r.key, r.a) for r in df.collect()} == {(i, i * 2)
                                                    for i in range(5)}


def test_delta_rename_drop_guards(spark, tmp_path):
    """Unmapped tables refuse rename/drop with a pointer to the upgrade;
    partition columns, duplicate names, and last-column drops refuse."""
    import pytest

    from evolution_spark.io.delta_log import (
        DeltaProtocolError,
        drop_delta_column,
        rename_delta_column,
        upgrade_delta_to_column_mapping,
        write_delta_snapshot,
    )

    plain = str(tmp_path / "plain")
    write_delta_snapshot(
        spark.range(4).select(F.col("id").alias("k"), F.col("id").alias("v")),
        plain,
    )
    with pytest.raises(DeltaProtocolError, match="upgrade_delta_to_column_mapping"):
        rename_delta_column(plain, "k", "kk")
    with pytest.raises(DeltaProtocolError, match="upgrade_delta_to_column_mapping"):
        drop_delta_column(plain, "v")
    upgrade_delta_to_column_mapping(plain)
    with pytest.raises(ValueError, match="already exists"):
        rename_delta_column(plain, "k", "V")  # case-insensitive collision
    with pytest.raises(ValueError, match="not in schema"):
        rename_delta_column(plain, "zz", "y")
    drop_delta_column(plain, "v")
    with pytest.raises(ValueError, match="last column"):
        drop_delta_column(plain, "k")
    part = str(tmp_path / "part")
    write_delta_snapshot(
        spark.range(4).select(F.col("id").alias("k"), (F.col("id") % 2).alias("p")),
        part, partition_by=["p"],
    )
    # round-8: partitioned tables UPGRADE (metadata-only, layout already
    # physical-keyed); only the partition column itself stays guarded
    upgrade_delta_to_column_mapping(part)
    with pytest.raises(ValueError, match="partition column"):
        rename_delta_column(part, "p", "p2")
    with pytest.raises(ValueError, match="partition column"):
        drop_delta_column(part, "p")
    rename_delta_column(part, "k", "key")  # non-partition rename is fine


# --------------------------------------------------------------------------
# Iceberg RENAME / DROP / type-widen (field-id-stable, metadata-only)
# --------------------------------------------------------------------------


def test_iceberg_rename_widen_drop_lifecycle(spark, tmp_path):
    """rename -> append -> widen -> append -> DML across schema epochs ->
    drop -> re-add -> compaction; the per-schema-group realigned read
    resolves every epoch by field id."""
    from evolution_spark.io.iceberg_meta import (
        append_iceberg_snapshot,
        compact_iceberg_table,
        delete_iceberg_rows,
        drop_iceberg_column,
        evolve_iceberg_schema,
        read_iceberg_table,
        rename_iceberg_column,
        widen_iceberg_column,
        write_iceberg_table,
    )

    path = str(tmp_path / "icevol")
    write_iceberg_table(
        spark.range(10).select(F.col("id").cast("int").alias("k"),
                               (F.col("id") * 10).alias("v")),
        path,
    )
    rename_iceberg_column(path, "v", "val")  # metadata-only
    df = read_iceberg_table(spark, path)
    assert df.columns == ["k", "val"]
    assert {(r.k, r.val) for r in df.collect()} == {(i, i * 10)
                                                    for i in range(10)}
    append_iceberg_snapshot(
        spark.range(10, 13).select(F.col("id").cast("int").alias("k"),
                                   (F.col("id") * 10).alias("val")),
        path,
    )
    widen_iceberg_column(path, "k", "long")
    df = read_iceberg_table(spark, path)
    assert dict(df.dtypes)["k"] == "bigint"
    assert {r.k for r in df.collect()} == set(range(13))
    append_iceberg_snapshot(
        spark.range(13, 15).select(F.col("id").alias("k"),
                                   (F.col("id") * 10).alias("val")),
        path,
    )
    # predicate DML spans all three schema epochs
    delete_iceberg_rows(spark, path, "k % 2 = 0")
    got = {(r.k, r.val) for r in read_iceberg_table(spark, path).collect()}
    assert got == {(i, i * 10) for i in range(15) if i % 2 == 1}
    drop_iceberg_column(path, "val")
    assert read_iceberg_table(spark, path).columns == ["k"]
    # re-added name -> fresh field id, dropped data cannot resurrect
    evolve_iceberg_schema(path, [("val", "long")])
    assert all(r.val is None
               for r in read_iceberg_table(spark, path).collect())
    compact_iceberg_table(spark, path)
    assert {r.k for r in read_iceberg_table(spark, path).collect()} == {
        i for i in range(15) if i % 2 == 1
    }


def test_iceberg_evolution_time_travel_and_source(spark, tmp_path):
    """Time travel reads each snapshot under ITS schema; the
    evolution_iceberg DataSource resolves evolved tables via per-slice
    renames + executor-side upcasts."""
    from evolution_spark.io.iceberg_meta import (
        _load_metadata,
        append_iceberg_snapshot,
        delete_iceberg_rows,
        read_iceberg_table,
        rename_iceberg_column,
        widen_iceberg_column,
        write_iceberg_table,
    )
    from evolution_spark.io.iceberg_source import register_iceberg_source
    from pathlib import Path as _P

    register_iceberg_source(spark)
    path = str(tmp_path / "icevolsrc")
    write_iceberg_table(
        spark.range(8).select(F.col("id").cast("int").alias("k"),
                              (F.col("id") * 10).alias("v")),
        path,
    )
    rename_iceberg_column(path, "v", "val")
    widen_iceberg_column(path, "k", "long")
    append_iceberg_snapshot(
        spark.range(8, 11).select(F.col("id").alias("k"),
                                  (F.col("id") * 10).alias("val")),
        path,
    )
    delete_iceberg_rows(spark, path, "k = 1")
    df = spark.read.format("evolution_iceberg").load(path)
    assert df.columns == ["k", "val"] and dict(df.dtypes)["k"] == "bigint"
    assert {(r.k, r.val) for r in df.collect()} == {
        (i, i * 10) for i in range(11) if i != 1
    }
    # time travel: the first snapshot keeps its original schema, both via
    # the library reader and the DataSource
    md, _ = _load_metadata(_P(path))
    first = min(md["snapshots"], key=lambda s: s["sequence-number"])
    old = read_iceberg_table(spark, path, snapshot_id=first["snapshot-id"])
    assert old.columns == ["k", "v"] and dict(old.dtypes)["k"] == "int"
    assert old.count() == 8
    src_old = (spark.read.format("evolution_iceberg")
               .option("snapshot", first["snapshot-id"]).load(path))
    assert src_old.columns == ["k", "v"] and src_old.count() == 8


def test_iceberg_rename_widen_guards(spark, tmp_path):
    """Partition-source columns refuse rename/drop/widen; non-promotable
    widenings refuse; duplicate/missing names refuse."""
    import pytest

    from evolution_spark.io.iceberg_meta import (
        drop_iceberg_column,
        rename_iceberg_column,
        widen_iceberg_column,
        write_iceberg_table,
    )

    path = str(tmp_path / "icevg")
    write_iceberg_table(
        spark.range(6).select(F.col("id").cast("int").alias("k"),
                              (F.col("id") % 2).alias("p"),
                              (F.col("id") * 1.0).alias("x")),
        path, partition_by=["p"],
    )
    with pytest.raises(ValueError, match="partition source"):
        rename_iceberg_column(path, "p", "q")
    with pytest.raises(ValueError, match="partition source"):
        drop_iceberg_column(path, "p")
    with pytest.raises(TypeError, match="promotions"):
        widen_iceberg_column(path, "k", "double")  # int->double refused
    with pytest.raises(TypeError, match="promotions"):
        widen_iceberg_column(path, "x", "long")
    with pytest.raises(ValueError, match="already exists"):
        rename_iceberg_column(path, "k", "X")  # case-insensitive
    with pytest.raises(ValueError, match="not in schema"):
        rename_iceberg_column(path, "zz", "y")


def test_delta_sink_append_into_mapped_table(spark, tmp_path):
    """Review fix: the evolution_delta sink must stage shards under
    PHYSICAL column names when the target is column-mapped — logical
    names would read back as all-null through every mapped reader."""
    from evolution_spark.io.delta_log import (
        read_delta_snapshot,
        rename_delta_column,
        write_delta_snapshot,
    )
    from evolution_spark.io.delta_source import register_delta_source

    register_delta_source(spark)
    path = str(tmp_path / "sinkmap")
    write_delta_snapshot(
        spark.range(5).select(F.col("id").alias("k"),
                              (F.col("id") * 10).alias("v")),
        path, column_mapping=True,
    )
    rename_delta_column(path, "v", "val")
    spark.range(5, 8).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("val")
    ).write.format("evolution_delta").mode("append").save(path)
    got = {(r.k, r.val) for r in read_delta_snapshot(spark, path).collect()}
    assert got == {(i, i * 10) for i in range(8)}
    # and through the DataSource's own read path
    src = spark.read.format("evolution_delta").load(path)
    assert {(r.k, r.val) for r in src.collect()} == got


def test_delta_merge_pruned_on_mapped_table(spark, tmp_path):
    """Review fix: merge_delta_cdc's file-pruned branch must scan mapped
    files under physical names — the logical-name scan read a renamed
    column as null and the replace commit PERSISTED the nulls."""
    from evolution_spark.io.delta_log import (
        merge_delta_cdc,
        read_delta_snapshot,
        rename_delta_column,
        upgrade_delta_to_column_mapping,
        write_delta_snapshot,
    )

    path = str(tmp_path / "mrgmap")
    write_delta_snapshot(
        spark.range(20).select(F.col("id").alias("k"),
                               (F.col("id") * 10).alias("v")),
        path,
    )
    upgrade_delta_to_column_mapping(path)
    rename_delta_column(path, "v", "val")
    changes = spark.createDataFrame(
        [(3, 999, "u"), (5, None, "d"), (100, 1, "u")],
        "k long, val long, _op string",
    )
    res = merge_delta_cdc(spark, path, changes, key="k")
    assert res["pruned"] is True  # the pruned branch actually ran
    got = {(r.k, r.val) for r in read_delta_snapshot(spark, path).collect()}
    want = {(i, i * 10) for i in range(20) if i not in (3, 5)}
    want |= {(3, 999), (100, 1)}
    assert got == want


def test_iceberg_dml_right_after_metadata_only_rename(spark, tmp_path):
    """Review fix: DELETE/UPDATE/MERGE pin their scan to the current
    snapshot for race-freedom but must expose the CURRENT schema — a
    metadata-only rename creates no snapshot, so snapshot-schema
    resolution would run DML against the stale names."""
    from evolution_spark.io.iceberg_meta import (
        delete_iceberg_rows,
        merge_iceberg_cdc,
        read_iceberg_table,
        rename_iceberg_column,
        update_iceberg_rows,
        write_iceberg_table,
    )

    path = str(tmp_path / "dmlren")
    write_iceberg_table(
        spark.range(12).select(F.col("id").alias("k"),
                               (F.col("id") * 10).alias("v")),
        path,
    )
    rename_iceberg_column(path, "v", "val")  # NO snapshot in between
    assert delete_iceberg_rows(spark, path, "val >= 100")["deleted_rows"] == 2
    assert update_iceberg_rows(spark, path, "val = 0", {"val": "val + 7"})[
        "updated_rows"
    ] == 1
    assert merge_iceberg_cdc(
        spark, path,
        spark.createDataFrame([(1, 111, "u")], "k long, val long, _op string"),
        key="k",
    )["matched"] == 1
    got = {(r.k, r.val) for r in read_iceberg_table(spark, path).collect()}
    assert got == {(i, i * 10) for i in range(2, 10)} | {(0, 7), (1, 111)}


def test_iceberg_stream_initial_snapshot_after_rename(spark, tmp_path):
    """Review fix: the streaming source's initial snapshot pins the file
    list by snapshot id but must resolve renames against the CURRENT
    schema its read() projects with — old-schema resolution emitted the
    renamed column as all-null."""
    from evolution_spark.io.iceberg_meta import (
        rename_iceberg_column,
        write_iceberg_table,
    )
    from evolution_spark.io.iceberg_source import register_iceberg_source

    register_iceberg_source(spark)
    path = str(tmp_path / "strren")
    write_iceberg_table(
        spark.range(6).select(F.col("id").alias("k"),
                              (F.col("id") * 2).alias("v")),
        path,
    )
    rename_iceberg_column(path, "v", "w")
    q = (
        spark.readStream.format("evolution_iceberg").load(path)
        .writeStream.format("memory").queryName("evo_ren_stream").start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT k, w FROM evo_ren_stream").collect()
        assert {(r.k, r.w) for r in rows} == {(i, i * 2) for i in range(6)}
    finally:
        q.stop()


def test_iceberg_evolution_refused_while_equality_deletes_live(spark, tmp_path):
    """Review fix: rename/drop/widen refuse while equality deletes are
    live (the evolved read cannot resolve delete-file columns across
    epochs, and compaction goes through the same read — evolving first
    would brick the table with circular advice)."""
    import pytest

    from evolution_spark.io.iceberg_meta import (
        append_equality_deletes,
        compact_iceberg_table,
        read_iceberg_table,
        rename_iceberg_column,
        write_iceberg_table,
    )

    path = str(tmp_path / "eqevol")
    write_iceberg_table(
        spark.range(8).select(F.col("id").alias("k"),
                              (F.col("id") * 3).alias("v")),
        path,
    )
    append_equality_deletes(path, [{"k": 2}], ["k"])
    with pytest.raises(ValueError, match="EQUALITY deletes"):
        rename_iceberg_column(path, "v", "val")
    # the advised path works: compact, then evolve
    compact_iceberg_table(spark, path)
    rename_iceberg_column(path, "v", "val")
    got = {(r.k, r.val) for r in read_iceberg_table(spark, path).collect()}
    assert got == {(i, i * 3) for i in range(8) if i != 2}


def test_skip_where_bounds_survive_widen(spark, tmp_path):
    """Manifest bounds written as 4-byte int decode correctly after
    widen_iceberg_column(int -> long): _decode_bound keys off the STORED
    width, so stats skipping keeps working on widened columns (review
    r7: current-type decode crashed with struct.error)."""
    from pyspark.sql import functions as F

    from evolution_spark.io.iceberg_meta import (
        read_iceberg_table,
        widen_iceberg_column,
        write_iceberg_table,
    )

    path = str(tmp_path / "widenskip")
    df = spark.range(100).select(F.col("id").cast("int").alias("k"))
    write_iceberg_table(df.repartitionByRange(4, "k"), path)
    widen_iceberg_column(path, "k", "long")
    pruned = read_iceberg_table(spark, path, skip_where=[("k", ">=", 90)])
    assert len(pruned.inputFiles()) < 4
    assert pruned.where(F.col("k") >= 90).count() == 10


def test_skip_where_literal_type_mismatch_refuses(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from evolution_spark.io.iceberg_meta import (
        read_iceberg_table,
        write_iceberg_table,
    )

    path = str(tmp_path / "skiptype")
    write_iceberg_table(spark.range(10).select(F.col("id").alias("k")), path)
    with pytest.raises(TypeError, match="does not match column"):
        read_iceberg_table(spark, path, skip_where=[("k", ">=", "5")])


def test_iceberg_table_changes_realigns_evolved_schema(spark, tmp_path):
    """The change feed reads pre-rename/pre-widen files with their
    WRITTEN schema and realigns by field id — values survive, no silent
    NULLs (review r7)."""
    from pyspark.sql import functions as F

    from evolution_spark.io.iceberg_meta import (
        append_iceberg_snapshot,
        delete_iceberg_rows,
        iceberg_table_changes,
        read_iceberg_table,
        rename_iceberg_column,
        widen_iceberg_column,
        write_iceberg_table,
    )

    path = str(tmp_path / "cdcevolve")
    df = spark.range(10).select(
        F.col("id").alias("k"), F.col("id").cast("int").alias("v")
    )
    write_iceberg_table(df, path)
    rename_iceberg_column(path, "v", "val")
    widen_iceberg_column(path, "val", "long")
    # post-evolution activity: an append (new schema) and a delete whose
    # TARGETS are the pre-evolution files
    append_iceberg_snapshot(
        spark.range(10, 12).select(
            F.col("id").alias("k"), F.col("id").alias("val")
        ),
        path,
    )
    delete_iceberg_rows(spark, path, "k < 2")
    changes = iceberg_table_changes(spark, path)
    got = {
        (r.k, r.val, r._change_type) for r in changes.collect()
    }
    # inserts from the ORIGINAL files carry real values under the NEW name
    assert (0, 0, "insert") in got and (9, 9, "insert") in got
    assert (10, 10, "insert") in got and (11, 11, "insert") in got
    # delete pre-images from pre-evolution files carry real values too
    assert (0, 0, "delete") in got and (1, 1, "delete") in got
    assert not any(v is None for _, v, _ in got)
    assert read_iceberg_table(spark, path).count() == 10


def test_delta_rename_drop_refuse_constrained_columns(spark, tmp_path):
    """RENAME/DROP COLUMN refuse when a CHECK constraint references the
    column — otherwise every later commit fails constraint analysis and
    the table is un-writable (review r7, upstream-Delta behavior)."""
    import pytest
    from pyspark.sql import functions as F

    from evolution_spark.io.delta_log import (
        add_delta_constraint,
        drop_delta_column,
        rename_delta_column,
        upgrade_delta_to_column_mapping,
        write_delta_snapshot,
    )

    path = str(tmp_path / "constrained")
    write_delta_snapshot(
        spark.range(5).select(F.col("id").alias("k"),
                              (F.col("id") * 10.0).alias("bal")),
        path,
    )
    upgrade_delta_to_column_mapping(path)
    add_delta_constraint(spark, path, "bal_floor", "bal >= -1000")
    with pytest.raises(ValueError, match="CHECK constraint 'bal_floor'"):
        rename_delta_column(path, "bal", "balance")
    with pytest.raises(ValueError, match="CHECK constraint 'bal_floor'"):
        drop_delta_column(path, "bal")
    # the unconstrained column still renames/drops fine
    rename_delta_column(path, "k", "key")


def test_iceberg_update_keeps_total_records_honest(spark, tmp_path):
    """UPDATE/MERGE overwrite snapshots subtract their position deletes
    from total-records (review r7: adds-only counting drifted the
    summary above the live row count)."""
    from pathlib import Path

    from pyspark.sql import functions as F

    from evolution_spark.io.iceberg_meta import (
        _load_metadata,
        read_iceberg_table,
        update_iceberg_rows,
        write_iceberg_table,
    )

    path = str(tmp_path / "sumdrift")
    write_iceberg_table(
        spark.range(100).select(F.col("id").alias("k"),
                                F.lit(1).alias("v")),
        path,
    )
    update_iceberg_rows(spark, path, "k < 10", {"v": "2"})
    md, _ = _load_metadata(Path(path))
    cur = next(s for s in md["snapshots"]
               if s["snapshot-id"] == md["current-snapshot-id"])
    assert int(cur["summary"]["total-records"]) == 100
    assert read_iceberg_table(spark, path).count() == 100


def test_partitioned_upgrade_rename_lifecycle(spark, tmp_path):
    """Round-8: RENAME of a NON-partition column on a PARTITIONED table —
    the upgrade keeps physical name == current name, so the directory
    layout / partitionColumns / partitionValues stay untouched and every
    mapped read resolves through them."""
    from evolution_spark.io.delta_log import (
        commit_delta,
        delete_delta_rows,
        optimize_delta,
        read_delta_snapshot,
        rename_delta_column,
        upgrade_delta_to_column_mapping,
        write_delta_snapshot,
    )

    path = str(tmp_path / "partmap")
    df0 = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("seg"),
    )
    write_delta_snapshot(df0, path, partition_by=["seg"])
    up = upgrade_delta_to_column_mapping(path)
    assert up["mode"] == "name"
    rename_delta_column(path, "v", "val")

    back = read_delta_snapshot(spark, path)
    assert back.columns == ["k", "val", "seg"]
    assert sorted((r.k, r.val, r.seg) for r in back.collect()) == sorted(
        (i, i * 10, "a" if i % 2 == 0 else "b") for i in range(20)
    )
    # time travel to the pre-rename version sees the old name
    old = read_delta_snapshot(spark, path, version=0)
    assert old.columns == ["k", "v", "seg"]

    # appends land under physical names + physical partition dirs
    extra = spark.range(20, 25).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("val"),
        F.lit("c").alias("seg"),
    )
    commit_delta(extra, path, mode="append")
    assert read_delta_snapshot(spark, path).count() == 25

    # partition-scoped maintenance + DML still work on the mapped table
    optimize_delta(spark, path)
    assert read_delta_snapshot(spark, path).count() == 25
    delete_delta_rows(spark, path, "k >= 22")
    final = read_delta_snapshot(spark, path)
    assert final.count() == 22
    assert final.where(F.col("seg") == "c").count() == 2

    # renaming / dropping the PARTITION column stays refused
    import pytest as _pytest

    from evolution_spark.io.delta_log import drop_delta_column

    with _pytest.raises(ValueError, match="partition column"):
        rename_delta_column(path, "seg", "segment")
    with _pytest.raises(ValueError, match="partition column"):
        drop_delta_column(path, "seg")


def test_fresh_create_partitioned_mapped_table(spark, tmp_path):
    """column_mapping=True + partition_by: directory names, the
    partitionColumns list, and partitionValues keys all use the PHYSICAL
    (col-<hex>) partition name — and the read aliases back."""
    import json as _json

    from evolution_spark.io.delta_log import (
        read_delta_snapshot,
        rename_delta_column,
        write_delta_snapshot,
    )

    path = str(tmp_path / "freshmap")
    df0 = spark.range(10).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, "x").otherwise("y").alias("seg"),
    )
    write_delta_snapshot(df0, path, partition_by=["seg"], column_mapping=True)
    # layout is keyed by the physical name
    commit0 = (tmp_path / "freshmap" / "_delta_log" / f"{0:020d}.json").read_text()
    meta = next(
        _json.loads(l)["metaData"] for l in commit0.splitlines()
        if "metaData" in l
    )
    phys_seg = meta["partitionColumns"][0]
    assert phys_seg.startswith("col-")
    assert any(p.name.startswith(f"{phys_seg}=")
               for p in (tmp_path / "freshmap").iterdir() if p.is_dir())
    back = read_delta_snapshot(spark, path)
    assert back.columns == ["k", "seg"]
    assert sorted((r.k, r.seg) for r in back.collect()) == sorted(
        (i, "x" if i % 2 == 0 else "y") for i in range(10)
    )
    # the partition column guard works through the physical name
    import pytest as _pytest

    with _pytest.raises(ValueError, match="partition column"):
        rename_delta_column(path, "seg", "segment")
    # non-partition renames stay metadata-only
    rename_delta_column(path, "k", "key")
    assert read_delta_snapshot(spark, path).columns == ["key", "seg"]
