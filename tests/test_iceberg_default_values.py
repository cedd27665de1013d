"""Iceberg v3 COLUMN DEFAULTS (spec v3 'Default values' — round 11):
``initial-default`` on schema fields is honored on read for rows written
before the column existed, on both the library reader and the
``evolution_iceberg`` DataSource; unsupported encodings refuse loudly.
"""

from __future__ import annotations

import datetime
import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from evolution_spark.io.iceberg_meta import (
    IcebergFormatError,
    _load_metadata,
    append_iceberg_snapshot,
    evolve_iceberg_schema,
    read_iceberg_table,
    upgrade_iceberg_format_version,
    write_iceberg_table,
)


def _evolved(spark, tmp_path, name):
    d = str(tmp_path / name)
    df = spark.range(6).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    write_iceberg_table(df.where("k < 3"), d)
    upgrade_iceberg_format_version(d)
    evolve_iceberg_schema(d, [
        ("tier", "string", "bronze"),
        ("score", "double", 1.5),
        ("joined", "date", datetime.date(2020, 1, 2)),
        ("note", "string"),  # no default: pre-evolution rows read null
    ])
    append_iceberg_snapshot(
        df.where("k >= 3").select(
            "k", "v",
            F.lit("gold").alias("tier"), F.lit(9.0).alias("score"),
            F.lit(datetime.date(2024, 5, 5)).alias("joined"),
            F.lit("x").alias("note"),
        ),
        d,
    )
    return d


def test_initial_default_injected_for_pre_evolution_rows(spark, tmp_path):
    d = _evolved(spark, tmp_path, "def")
    rows = {
        r["k"]: (r["tier"], r["score"], str(r["joined"]), r["note"])
        for r in read_iceberg_table(spark, d).collect()
    }
    assert rows[0] == ("bronze", 1.5, "2020-01-02", None)
    assert rows[2] == ("bronze", 1.5, "2020-01-02", None)
    assert rows[4] == ("gold", 9.0, "2024-05-05", "x")
    # the metadata carries both defaults, JSON-single-value encoded
    meta, _ = _load_metadata(Path(d))
    cur = next(
        s for s in meta["schemas"]
        if s["schema-id"] == meta["current-schema-id"]
    )
    tier = next(f for f in cur["fields"] if f["name"] == "tier")
    assert tier["initial-default"] == "bronze"
    assert tier["write-default"] == "bronze"
    joined = next(f for f in cur["fields"] if f["name"] == "joined")
    assert joined["initial-default"] == "2020-01-02"


def test_datasource_path_injects_same_defaults(spark, tmp_path):
    from evolution_spark.io.iceberg_source import EvolutionIcebergDataSource

    d = _evolved(spark, tmp_path, "defsrc")
    spark.dataSource.register(EvolutionIcebergDataSource)
    lib = read_iceberg_table(spark, d)
    src = spark.read.format("evolution_iceberg").load(d)
    assert src.exceptAll(lib).isEmpty() and lib.exceptAll(src).isEmpty()


def test_default_on_v2_table_refuses(spark, tmp_path):
    d = str(tmp_path / "v2def")
    write_iceberg_table(spark.range(3).select(F.col("id").alias("k")), d)
    with pytest.raises(IcebergFormatError, match="format-version 3"):
        evolve_iceberg_schema(d, [("tier", "string", "legacy")])


def test_mistyped_default_refuses_at_ddl_time(spark, tmp_path):
    d = str(tmp_path / "baddef")
    write_iceberg_table(spark.range(3).select(F.col("id").alias("k")), d)
    upgrade_iceberg_format_version(d)
    with pytest.raises(IcebergFormatError, match="initial-default"):
        evolve_iceberg_schema(d, [("n", "long", "not-a-number")])


def test_foreign_unsupported_default_encoding_refuses_on_read(
    spark, tmp_path
):
    """A foreign v3 table whose initial-default this reader cannot decode
    (e.g. a decimal string) must refuse the evolved read — injecting a
    guess would corrupt every pre-evolution row."""
    d = str(tmp_path / "odd")
    df = spark.range(4).select(F.col("id").alias("k"))
    write_iceberg_table(df.where("k < 2"), d)
    upgrade_iceberg_format_version(d)
    evolve_iceberg_schema(d, [("w", "long", 7)])
    append_iceberg_snapshot(
        df.where("k >= 2").select("k", F.lit(1).cast("long").alias("w")), d
    )
    meta_dir = Path(d) / "metadata"
    hint = (meta_dir / "version-hint.text").read_text().strip()
    meta = json.loads((meta_dir / hint).read_text())
    for s in meta["schemas"]:
        for f in s["fields"]:
            if f["name"] == "w" and "initial-default" in f:
                f["initial-default"] = {"weird": "shape"}
    (meta_dir / hint).write_text(json.dumps(meta))
    with pytest.raises(IcebergFormatError, match="initial-default"):
        read_iceberg_table(spark, d).collect()


def test_write_default_fills_omitted_columns(spark, tmp_path):
    """Round 12 (spec v3 'Default values' write side): an append that
    omits columns carrying a write-default gets them filled — physically
    written, since the new file claims the current schema and the read
    realign never injects for it."""
    d = _evolved(spark, tmp_path, "wd_fill")
    # omit tier/score/joined (all have write-defaults) but keep note
    append_iceberg_snapshot(
        spark.range(6, 9).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
            F.lit("y").alias("note"),
        ),
        d,
    )
    back = read_iceberg_table(spark, d).where("k >= 6")
    rows = {r["k"]: r for r in back.collect()}
    assert set(rows) == {6, 7, 8}
    for r in rows.values():
        assert r["tier"] == "bronze" and r["score"] == 1.5
        assert str(r["joined"]) == "2020-01-02" and r["note"] == "y"
    # the fill is PHYSICAL: the newest data file contains the columns
    files = sorted(
        (Path(d) / "data").glob("*.parquet"),
        key=lambda p: p.stat().st_mtime,
    )
    raw = spark.read.parquet(str(files[-1]))
    assert "tier" in raw.columns
    assert raw.where("tier = 'bronze'").count() == raw.count() > 0


def test_omitting_column_without_default_still_refuses(spark, tmp_path):
    """'note' has NO write-default: omitting it stays a schema mismatch
    (silent null-filling is not the contract)."""
    d = _evolved(spark, tmp_path, "wd_strict")
    with pytest.raises(ValueError, match="schema mismatch"):
        append_iceberg_snapshot(
            spark.range(9, 11).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
            ),
            d,
        )


def test_v2_table_append_unchanged_by_fill_path(spark, tmp_path):
    """A v2 table (no format upgrade) keeps the strict schema check for
    any omission — write-default is a v3 feature."""
    d = str(tmp_path / "wd_v2")
    df = spark.range(4).select(F.col("id").alias("k"))
    write_iceberg_table(df, d)
    with pytest.raises(ValueError, match="schema mismatch"):
        append_iceberg_snapshot(spark.range(4, 6).select(
            F.col("id").alias("extra")), d)
