"""Delta ROW-TRACKING-PRESERVING REWRITES (round 11; PROTOCOL.md 'Row
Tracking'): OPTIMIZE / UPDATE / MERGE on a rowTracking table materialize
each carried row's ``_row_id`` / ``_row_commit_version`` into the
rewritten files under the configuration's
``delta.rowTracking.materializedRow*ColumnName`` columns, so stable ids
survive rewrites. Reader rule mirror: materialized value, else
baseRowId + position / defaultRowCommitVersion.

Ref parity: the reference's Delta target is ``todo!()``
(examples/delta/src/main.rs:28-30) — this surface exceeds it.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from evolution_spark.io.delta_log import (
    DeltaProtocolError,
    _RT_ID_KEY,
    _RT_VER_KEY,
    _replay_log,
    commit_delta,
    delete_delta_rows,
    ensure_row_tracking_materialized,
    merge_delta_cdc,
    optimize_delta,
    read_delta_row_lineage,
    read_delta_snapshot,
    update_delta_rows,
    write_delta_snapshot,
)


def _mk(spark, d, n=12):
    """v0 pre-feature (k<4, null lineage), then two tracked appends."""
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    write_delta_snapshot(df.where("k < 4"), d)
    log = Path(d) / "_delta_log"
    (log / f"{1:020d}.json").write_text(json.dumps({"protocol": {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["rowTracking", "domainMetadata"],
        "writerFeatures": ["rowTracking", "domainMetadata"]}}) + "\n")
    commit_delta(df.where("k >= 4 and k < 8"), d, mode="append")
    commit_delta(df.where("k >= 8"), d, mode="append")
    return df


def _lin(spark, d):
    return {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in read_delta_row_lineage(spark, d).collect()
    }


def test_row_lineage_read_rule(spark, tmp_path):
    d = str(tmp_path / "lin")
    _mk(spark, d)
    delete_delta_rows(spark, d, "k = 5")
    byk = _lin(spark, d)
    assert all(byk[k] == (None, None) for k in range(4))  # pre-feature
    assert 5 not in byk  # DV applied
    assert byk[4] == (0, 2) and byk[6] == (2, 2) and byk[7] == (3, 2)
    assert byk[8] == (4, 3) and byk[11] == (7, 3)


def test_optimize_preserves_ids_and_assigns_fresh(spark, tmp_path):
    d = str(tmp_path / "opt")
    _mk(spark, d)
    delete_delta_rows(spark, d, "k = 5")
    pre = _lin(spark, d)
    optimize_delta(spark, d, target_files=2)
    post = _lin(spark, d)
    for k, v in pre.items():
        if v[0] is not None:
            assert post[k] == v, (k, v, post[k])
    fresh = [post[k] for k in pre if pre[k][0] is None]
    assert all(i is not None and ver is not None for i, ver in fresh)
    assert len({p[0] for p in post.values()}) == len(post)
    # materialized names recorded in the table configuration
    _, _, _, _, st = _replay_log(Path(d), return_state=True)
    cfg = st["metadata"]["configuration"]
    assert cfg[_RT_ID_KEY] and cfg[_RT_VER_KEY]
    # a second OPTIMIZE (incl. Z-order) is a lineage no-op
    optimize_delta(spark, d, target_files=2, zorder_by=["k"])
    assert _lin(spark, d) == post
    # the extra physical columns never leak into plain reads
    assert set(read_delta_snapshot(spark, d).columns) == {"k", "v"}


def test_update_keeps_id_resets_commit_version(spark, tmp_path):
    d = str(tmp_path / "upd")
    _mk(spark, d)
    optimize_delta(spark, d)  # assign ids everywhere first
    pre = _lin(spark, d)
    res = update_delta_rows(spark, d, "k in (6, 8)", {"v": "v + 100"})
    post = _lin(spark, d)
    assert post[6][0] == pre[6][0] and post[8][0] == pre[8][0]
    assert post[6][1] == res["version"] == post[8][1]
    assert post[7] == pre[7]
    vals = {r["k"]: r["v"] for r in read_delta_snapshot(spark, d).collect()}
    assert vals[6] == 112 and vals[8] == 116 and len(vals) == 12
    # update-of-an-update keeps the original id
    res2 = update_delta_rows(spark, d, "k = 6", {"v": "v + 1000"})
    post2 = _lin(spark, d)
    assert post2[6] == (pre[6][0], res2["version"])


@pytest.mark.parametrize("prune", [True, False])
def test_merge_carries_update_ids_and_mints_insert_ids(
    spark, tmp_path, prune
):
    d = str(tmp_path / f"mrg{int(prune)}")
    _mk(spark, d)
    optimize_delta(spark, d, target_files=3)
    pre = _lin(spark, d)
    ch = spark.createDataFrame(
        [(2, 999, "u"), (3, None, "d"), (100, 42, "u")],
        "k long, v long, _op string",
    )
    ms = merge_delta_cdc(spark, d, ch, key="k", prune_files=prune)
    post = _lin(spark, d)
    assert 3 not in post
    assert post[2] == (pre[2][0], ms["version"])  # update keeps id
    assert post[5] == pre[5]  # carried row keeps id AND version
    assert post[100][0] is not None
    assert post[100][0] not in {p[0] for p in pre.values()}
    ids = [p[0] for p in post.values()]
    assert len(set(ids)) == len(ids)
    assert read_delta_snapshot(spark, d).count() == 12


def test_merge_insert_only_no_range_hits(spark, tmp_path):
    """Review r11 pass 2: an insert-only MERGE whose change keys hit no
    file's min/max range reads an EMPTY pruned target through the
    lineage scan — the zero-file branch must still expose the lineage
    columns. The insert mints a fresh id."""
    d = str(tmp_path / "insonly")
    _mk(spark, d)
    optimize_delta(spark, d)
    pre = _lin(spark, d)
    ch = spark.createDataFrame(
        [(500, 1, "u")], "k long, v long, _op string"
    )
    merge_delta_cdc(spark, d, ch, key="k")
    post = _lin(spark, d)
    assert post[500][0] is not None
    assert post[500][0] not in {v[0] for k, v in pre.items()}
    for k, v in pre.items():
        assert post[k] == v  # untouched rows untouched
    # checkpoint carries the lineage state: replay from the checkpoint
    # alone reads identical ids
    from evolution_spark.io.delta_log import checkpoint_delta

    checkpoint_delta(d)
    log = Path(d) / "_delta_log"
    import json as _json

    last = _json.loads((log / "_last_checkpoint").read_text())["version"]
    for p in list(log.glob("*.json")):
        if int(p.stem) < last:
            p.unlink()
    assert _lin(spark, d) == post


def test_bare_replace_still_refuses(spark, tmp_path):
    d = str(tmp_path / "bare")
    _mk(spark, d)
    with pytest.raises(DeltaProtocolError, match="row tracking"):
        commit_delta(
            read_delta_snapshot(spark, d).coalesce(1), d, mode="replace",
            remove_paths=[], data_change=False, operation="OPTIMIZE",
        )


def test_ensure_materialized_idempotent(spark, tmp_path):
    d = str(tmp_path / "ens")
    _mk(spark, d)
    a = ensure_row_tracking_materialized(d)
    v1 = _replay_log(Path(d))[3]
    b = ensure_row_tracking_materialized(d)
    assert a == b
    assert _replay_log(Path(d))[3] == v1  # second call commits nothing


def test_rt_materialized_must_match_config(spark, tmp_path):
    d = str(tmp_path / "mismatch")
    _mk(spark, d)
    ensure_row_tracking_materialized(d)
    with pytest.raises(DeltaProtocolError, match="do not match"):
        commit_delta(
            read_delta_snapshot(spark, d)
            .withColumn("x", F.lit(None).cast("long"))
            .withColumn("y", F.lit(None).cast("long")),
            d, mode="replace", remove_paths=[], data_change=False,
            _rt_materialized=("x", "y"),
        )


def test_optimize_on_column_mapped_row_tracking_table(spark, tmp_path):
    """rowTracking × columnMapping(name): the materialized columns are
    physical names outside the schema and must survive the physicalize
    projection; data columns still rename logical->physical (the rename
    makes logical != physical, so a physicalize bug cannot hide)."""
    from evolution_spark.io.delta_log import (
        rename_delta_column,
        upgrade_delta_to_column_mapping,
    )

    d = str(tmp_path / "mapped")
    df = spark.range(8).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    write_delta_snapshot(df.where("k < 4"), d)
    upgrade_delta_to_column_mapping(d)
    rename_delta_column(d, "v", "val")
    log = Path(d) / "_delta_log"
    latest = max(int(p.stem) for p in log.glob("*.json"))
    _, _, _, _, st = _replay_log(Path(d), return_state=True)
    proto = st["protocol"]
    (log / f"{latest + 1:020d}.json").write_text(json.dumps({"protocol": {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": sorted(
            set(proto.get("readerFeatures") or ["columnMapping"])
            | {"rowTracking", "domainMetadata"}
        ),
        "writerFeatures": sorted(
            set(proto.get("writerFeatures") or ["columnMapping"])
            | {"rowTracking", "domainMetadata"}
        )}}) + "\n")
    commit_delta(
        df.where("k >= 4").withColumnRenamed("v", "val"), d, mode="append"
    )
    pre = _lin(spark, d)
    assert pre[4][0] is not None
    optimize_delta(spark, d, target_files=1)
    post = _lin(spark, d)
    for k, v in pre.items():
        if v[0] is not None:
            assert post[k] == v
    assert len({p[0] for p in post.values()}) == len(post)
    vals = {
        r["k"]: r["val"] for r in read_delta_snapshot(spark, d).collect()
    }
    assert vals == {i: i * 2 for i in range(8)}


def _set_id_mode(d):
    """Forge a foreign commit flipping the table to columnMapping id mode
    (this engine never writes one — the fixture mirrors a foreign table)."""
    log = Path(d) / "_delta_log"
    v0 = [
        json.loads(line)
        for line in (log / f"{0:020d}.json").read_text().splitlines()
    ]
    metadata = next(a["metaData"] for a in v0 if "metaData" in a)
    metadata = dict(metadata)
    metadata["configuration"] = {
        **(metadata.get("configuration") or {}),
        "delta.columnMapping.mode": "id",
        "delta.columnMapping.maxColumnId": "0",
    }
    latest = max(int(p.stem) for p in log.glob("*.json"))
    (log / f"{latest + 1:020d}.json").write_text(
        json.dumps({"metaData": metadata}) + "\n"
    )


def test_ensure_materialized_refuses_id_mode(spark, tmp_path):
    """review r11 pass 3: materialization publishes a COMMIT — it must hit
    the same id-mode write refusal as every other write path instead of
    committing into a table this engine declares read-only."""
    d = str(tmp_path / "idmode")
    _mk(spark, d)
    _set_id_mode(d)
    before = _replay_log(Path(d))[3]
    with pytest.raises(DeltaProtocolError, match="id"):
        ensure_row_tracking_materialized(d)
    assert _replay_log(Path(d))[3] == before  # nothing published


def test_failed_update_publishes_no_commit(spark, tmp_path):
    """review r11 pass 3: input validation must run BEFORE the
    row-tracking materialization commit — a refused UPDATE/MERGE leaves
    the log untouched."""
    d = str(tmp_path / "noleak")
    _mk(spark, d)
    before = _replay_log(Path(d))[3]
    with pytest.raises(ValueError, match="unknown columns"):
        update_delta_rows(spark, d, "k = 4", {"no_such_col": "1"})
    assert _replay_log(Path(d))[3] == before
    with pytest.raises(ValueError, match="set_exprs must be non-empty"):
        update_delta_rows(spark, d, "k = 4", {})
    assert _replay_log(Path(d))[3] == before
    bad = spark.createDataFrame([(4, 1, "x")], "k long, v long, op string")
    with pytest.raises(ValueError, match="unknown op"):
        merge_delta_cdc(spark, d, bad, key="k", op_col="op")
    assert _replay_log(Path(d))[3] == before
    dup = spark.createDataFrame(
        [(4, 1, "u"), (4, 2, "u")], "k long, v long, op string"
    )
    with pytest.raises(ValueError, match="duplicate key"):
        merge_delta_cdc(spark, d, dup, key="k", op_col="op")
    assert _replay_log(Path(d))[3] == before
    with pytest.raises(ValueError, match="not in table columns"):
        merge_delta_cdc(
            spark, d,
            spark.createDataFrame([(1, "u")], "zz long, op string"),
            key="zz", op_col="op",
        )
    assert _replay_log(Path(d))[3] == before


def test_steady_state_dml_publishes_one_commit_each(spark, tmp_path):
    """After the names exist, each DML publishes exactly ONE commit (the
    steady-state fast path resolves names from the caller's replay — no
    ensure commit, no second replay)."""
    d = str(tmp_path / "steady")
    _mk(spark, d)
    update_delta_rows(spark, d, "k = 4", {"v": "v + 1"})  # may publish 2
    v1 = _replay_log(Path(d))[3]
    update_delta_rows(spark, d, "k = 6", {"v": "v + 1"})
    assert _replay_log(Path(d))[3] == v1 + 1
    optimize_delta(spark, d, target_files=1)
    assert _replay_log(Path(d))[3] == v1 + 2
