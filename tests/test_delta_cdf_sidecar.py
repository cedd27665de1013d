"""Delta Change Data Feed SIDECAR writes (delta.enableChangeDataFeed):
DML commits materialize their row-level changes as _change_data files
with cdc actions (PROTOCOL.md 'Add CDC File'), and table_changes prefers
the sidecars over add/remove derivation — exact changes including the
update pre/post-image pairing derivation cannot reconstruct. Reference
parity: the reference's Delta target is todo!()
(examples/delta/src/main.rs:28-30); this is native capability beyond it.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

CDF = {"delta.enableChangeDataFeed": "true"}


def _mk(spark, path, n=12):
    from evolution_spark.io.delta_log import write_delta_snapshot

    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    write_delta_snapshot(df, path, configuration=CDF)
    return df


def test_delete_writes_cdc_sidecar(spark, tmp_path):
    from evolution_spark.io.delta_log import (
        delete_delta_rows,
        read_delta_snapshot,
        table_changes,
    )

    path = str(tmp_path / "cdfdel")
    _mk(spark, path)
    res = delete_delta_rows(spark, path, "k % 3 = 0")
    assert res["deleted_rows"] == 4
    # sidecar files exist and the commit carries cdc actions
    side = list((tmp_path / "cdfdel" / "_change_data").glob("*.parquet"))
    assert side
    import json

    commit = (tmp_path / "cdfdel" / "_delta_log" / f"{res['version']:020d}.json").read_text()
    assert any("cdc" in json.loads(l) for l in commit.splitlines())
    # table_changes reads the sidecar for that version
    ch = table_changes(spark, path, res["version"])
    got = sorted((r.k, r.v, r._change_type) for r in ch.collect())
    assert got == [(k, k * 10, "delete") for k in (0, 3, 6, 9)]
    # snapshot read ignores cdc files (they are not table data)
    assert read_delta_snapshot(spark, path).count() == 8


def test_update_sidecar_pairs_pre_and_post_images(spark, tmp_path):
    from evolution_spark.io.delta_log import table_changes, update_delta_rows

    path = str(tmp_path / "cdfupd")
    _mk(spark, path)
    res = update_delta_rows(spark, path, "k >= 10", {"v": "v + 1"})
    ch = table_changes(spark, path, res["version"])
    got = sorted((r.k, r.v, r._change_type) for r in ch.collect())
    assert got == [
        (10, 100, "update_preimage"), (10, 101, "update_postimage"),
        (11, 110, "update_preimage"), (11, 111, "update_postimage"),
    ]


def test_merge_sidecar_excludes_carried_rows(spark, tmp_path):
    """The sidecar's whole point: a file-pruned MERGE rewrite carries
    unchanged rows into new files; derivation would report them all as
    delete+insert, the sidecar reports ONLY the real changes."""
    from evolution_spark.io.delta_log import merge_delta_cdc, table_changes

    path = str(tmp_path / "cdfmerge")
    _mk(spark, path)
    changes = spark.createDataFrame(
        [(3, 999, "u"), (7, None, "d"), (50, 500, "u")],
        "k long, v long, _op string",
    )
    res = merge_delta_cdc(spark, path, changes, key="k")
    ch = table_changes(spark, path, res["version"])
    got = sorted(
        (r.k, r.v, r._change_type) for r in ch.collect()
    )
    assert got == [
        (3, 30, "update_preimage"), (3, 999, "update_postimage"),
        (7, 70, "delete"),
        (50, 500, "insert"),
    ]
    # every change row carries the commit version
    assert {r._commit_version for r in ch.collect()} == {res["version"]}


def test_cdf_disabled_keeps_derivation(spark, tmp_path):
    from evolution_spark.io.delta_log import (
        delete_delta_rows,
        table_changes,
        write_delta_snapshot,
    )

    path = str(tmp_path / "nocdf")
    df = spark.range(6).select(F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    write_delta_snapshot(df, path)  # CDF off
    res = delete_delta_rows(spark, path, "k = 2")
    assert not (tmp_path / "nocdf" / "_change_data").exists()
    ch = table_changes(spark, path, res["version"])
    got = [(r.k, r.v, r._change_type) for r in ch.collect()]
    assert got == [(2, 20, "delete")]


def test_vacuum_spares_change_data(spark, tmp_path):
    from evolution_spark.io.delta_log import (
        commit_delta,
        delete_delta_rows,
        vacuum_delta,
    )

    path = str(tmp_path / "cdfvac")
    _mk(spark, path)
    delete_delta_rows(spark, path, "k % 2 = 0")
    # age the table one more version, then vacuum to the latest only
    commit_delta(
        spark.createDataFrame([(100, 1000)], "k long, v long"), path,
        mode="append",
    )
    before = sorted((tmp_path / "cdfvac" / "_change_data").glob("*.parquet"))
    assert before
    vacuum_delta(path, keep_versions=1)
    after = sorted((tmp_path / "cdfvac" / "_change_data").glob("*.parquet"))
    assert after == before


def test_partitioned_cdc_sidecar(spark, tmp_path):
    from evolution_spark.io.delta_log import (
        table_changes,
        update_delta_rows,
        write_delta_snapshot,
    )

    path = str(tmp_path / "cdfpart")
    df = spark.range(12).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("seg"),
    )
    write_delta_snapshot(df, path, partition_by=["seg"], configuration=CDF)
    res = update_delta_rows(spark, path, "k = 4", {"v": "v + 5"})
    # sidecars land under hive partition dirs inside _change_data
    dirs = {p.parent.name for p in Path(path, "_change_data").rglob("*.parquet")}
    assert dirs == {"seg=a"}
    ch = table_changes(spark, path, res["version"])
    got = sorted((r.k, r.v, r.seg, r._change_type) for r in ch.collect())
    assert got == [
        (4, 40, "a", "update_preimage"), (4, 45, "a", "update_postimage"),
    ]


def test_cdf_commits_declare_writer_feature(spark, tmp_path):
    """Spec feature-activation: a CDF table's protocol must carry the
    changeDataFeed writer feature — at creation, and via same-commit
    upgrade when the property lands on an existing table."""
    import json

    from evolution_spark.io.delta_log import _replay_log

    path = str(tmp_path / "cdffeat")
    _mk(spark, path)
    *_, state = _replay_log(Path(path), return_state=True)
    proto = state["protocol"]
    assert proto["minWriterVersion"] == 7
    assert "changeDataFeed" in proto["writerFeatures"]


def test_noop_merge_on_cdf_table_commits_nothing(spark, tmp_path):
    """A MERGE whose change set matches nothing must NOT commit: the
    pruned rewrite would carry identical rows, and with an empty cdc set
    table_changes would derive the commit as spurious delete+insert."""
    from evolution_spark.io.delta_log import (
        _log_versions,
        merge_delta_cdc,
        table_changes,
    )

    path = str(tmp_path / "cdfnoop")
    _mk(spark, path)
    # keys inside the table's min/max stats range but absent from data
    changes = spark.createDataFrame([], "k long, v long, _op string")
    before = _log_versions(Path(path) / "_delta_log")
    res = merge_delta_cdc(spark, path, changes, key="k")
    assert res["version"] is None
    assert _log_versions(Path(path) / "_delta_log") == before
    # d-op for a missing key: matched nothing -> also a no-op
    changes2 = spark.createDataFrame([(500, None, "d")], "k long, v long, _op string")
    res2 = merge_delta_cdc(spark, path, changes2, key="k")
    assert res2["version"] is None
    ch = table_changes(spark, path, 0)
    assert {r._change_type for r in ch.collect()} == {"insert"}


def test_vacuum_reclaims_orphaned_cdc(spark, tmp_path):
    """A cdc file moved into _change_data by a commit that never
    published is reclaimed once stale; referenced sidecars survive."""
    import os
    import time as _time

    from evolution_spark.io.delta_log import delete_delta_rows, vacuum_delta

    path = str(tmp_path / "cdforphan")
    _mk(spark, path)
    delete_delta_rows(spark, path, "k % 2 = 0")
    cdc_dir = Path(path) / "_change_data"
    referenced = sorted(cdc_dir.glob("*.parquet"))
    orphan = cdc_dir / "cdc-99999-deadbeef.parquet"
    orphan.write_bytes(referenced[0].read_bytes())
    old = _time.time() - 48 * 3600
    os.utime(orphan, (old, old))
    vacuum_delta(path, stale_staging_hours=24.0)
    assert not orphan.exists()
    assert all(p.exists() for p in referenced)


def test_history_and_metadata_tables(spark, tmp_path):
    """delta_table_history lists every commit with operation labels +
    action counts; iceberg_metadata_table exposes snapshots/files/
    manifests/refs/history as DataFrames (metadata-only)."""
    from evolution_spark.io.delta_log import (
        delete_delta_rows,
        delta_table_history,
        optimize_delta,
    )
    from evolution_spark.io.iceberg_meta import (
        append_iceberg_snapshot,
        create_iceberg_branch,
        iceberg_metadata_table,
        write_iceberg_table,
    )

    dpath = str(tmp_path / "histd")
    _mk(spark, dpath)
    delete_delta_rows(spark, dpath, "k % 2 = 0")
    optimize_delta(spark, dpath)
    h = delta_table_history(spark, dpath).orderBy("version").collect()
    assert [(r.version, r.operation) for r in h] == [
        (0, "WRITE"), (1, "DELETE"), (2, "OPTIMIZE")
    ]
    assert h[1].n_cdc_actions > 0  # CDF table: the DELETE wrote sidecars
    assert h[2].n_remove_actions > 0 and h[2].n_add_actions > 0

    ipath = str(tmp_path / "histi")
    df = spark.range(8).select(F.col("id").alias("k"))
    write_iceberg_table(df, ipath)
    append_iceberg_snapshot(spark.range(8, 10).select(F.col("id").alias("k")), ipath)
    create_iceberg_branch(ipath, "audit")
    snaps = iceberg_metadata_table(spark, ipath, "snapshots").collect()
    assert [r.sequence_number for r in sorted(snaps, key=lambda r: r.sequence_number)] == [1, 2]
    files = iceberg_metadata_table(spark, ipath, "files")
    assert files.count() > 0
    assert files.where(F.col("content") != 0).count() == 0
    refs = {r.name for r in iceberg_metadata_table(spark, ipath, "refs").collect()}
    assert "audit" in refs and "main" in refs
    hist = iceberg_metadata_table(spark, ipath, "history").collect()
    assert sum(1 for r in hist if r.is_current) == 1
    mans = iceberg_metadata_table(spark, ipath, "manifests")
    assert mans.count() >= 2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown metadata table"):
        iceberg_metadata_table(spark, ipath, "nope")
