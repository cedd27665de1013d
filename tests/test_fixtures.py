"""The literal FIXTURES.md schemas (F1-F4) — mock -> FLF -> parse -> re-encode
round trips plus the Converter.validate() two-pass defect listing."""

from __future__ import annotations

import pytest

from evolution_spark.converter import Converter
from evolution_spark.io.flf import encode_flf, parse_flf, read_flf
from evolution_spark.mocker import Mocker
from evolution_spark.schema import FixedSchema

F1_VALID_TEST = FixedSchema.from_dict({
    "name": "ValidTestSchema", "version": 1337,
    "columns": [
        {"name": "id", "offset": 0, "length": 9, "dtype": "Int32", "alignment": "Right", "pad_symbol": "Whitespace", "is_nullable": False},
        {"name": "name", "offset": 9, "length": 32, "dtype": "Utf8", "alignment": "Right", "pad_symbol": "Whitespace", "is_nullable": False},
        {"name": "city", "offset": 41, "length": 32, "dtype": "Utf8", "alignment": "Right", "pad_symbol": "Whitespace", "is_nullable": True},
        {"name": "employed", "offset": 73, "length": 5, "dtype": "Boolean", "alignment": "Right", "pad_symbol": "Hyphen", "is_nullable": True},
        {"name": "salary", "offset": 78, "length": 10, "dtype": "Float32", "is_nullable": False},
        {"name": "pet-name", "offset": 88, "length": 50, "dtype": "LargeUtf8", "alignment": "Left", "pad_symbol": "Asterisk", "is_nullable": True},
        {"name": "hours", "offset": 138, "length": 20, "dtype": "Float16", "alignment": "Center", "pad_symbol": "Underscore", "is_nullable": False},
    ],
})

F2_EXAMPLE = FixedSchema.from_dict({
    "name": "EvolutionExampleSchema", "version": 1337,
    "columns": [
        {"name": "cool", "offset": 0, "length": 9, "dtype": "Int32", "alignment": "Right", "pad_symbol": "Underscore", "is_nullable": False},
        {"name": "salary", "offset": 9, "length": 20, "dtype": "Float16", "alignment": "Left", "pad_symbol": "Asterisk", "is_nullable": False},
        {"name": "name", "offset": 29, "length": 30, "dtype": "Utf8", "alignment": "Center", "pad_symbol": "Semicolon", "is_nullable": True},
        {"name": "employed", "offset": 59, "length": 8, "dtype": "Boolean", "alignment": "Center", "pad_symbol": "Zero", "is_nullable": True},
    ],
})

F3_ALL_TYPES = FixedSchema.from_dict({
    "name": "AllTypes", "version": 1,
    "columns": [
        {"name": "c_bool", "offset": 0, "length": 6, "dtype": "Boolean", "is_nullable": True},
        {"name": "c_f16", "offset": 6, "length": 12, "dtype": "Float16", "is_nullable": True},
        {"name": "c_f32", "offset": 18, "length": 15, "dtype": "Float32", "is_nullable": True},
        {"name": "c_f64", "offset": 33, "length": 20, "dtype": "Float64", "is_nullable": True},
        {"name": "c_i16", "offset": 53, "length": 6, "dtype": "Int16", "is_nullable": True},
        {"name": "c_i32", "offset": 59, "length": 11, "dtype": "Int32", "is_nullable": True},
        {"name": "c_i64", "offset": 70, "length": 13, "dtype": "Int64", "is_nullable": True},
        {"name": "c_utf8", "offset": 83, "length": 10, "dtype": "Utf8", "is_nullable": True},
        {"name": "c_lutf8", "offset": 93, "length": 10, "dtype": "LargeUtf8", "is_nullable": False},
    ],
})

F4_EDGE = FixedSchema.from_dict({
    "name": "EdgeCases", "version": 1,
    "columns": [
        {"name": "uni_name", "offset": 0, "length": 12, "dtype": "Utf8", "alignment": "Left", "pad_symbol": "Dot", "is_nullable": True},
        {"name": "neg_int", "offset": 12, "length": 8, "dtype": "Int64", "alignment": "Right", "pad_symbol": "Whitespace", "is_nullable": False},
        {"name": "zero_pad", "offset": 20, "length": 9, "dtype": "Int32", "alignment": "Right", "pad_symbol": "Zero", "is_nullable": False},
        {"name": "strict", "offset": 29, "length": 6, "dtype": "Boolean", "alignment": "Center", "pad_symbol": "Whitespace", "is_nullable": False},
        {"name": "ctr_f64", "offset": 35, "length": 14, "dtype": "Float64", "alignment": "Center", "pad_symbol": "Underscore", "is_nullable": True},
    ],
})


@pytest.mark.parametrize(
    "schema,row_length",
    [(F1_VALID_TEST, 158), (F2_EXAMPLE, 67), (F3_ALL_TYPES, 103), (F4_EDGE, 49)],
    ids=["F1", "F2", "F3", "F4"],
)
def test_fixture_row_lengths(schema, row_length):
    assert schema.row_length == row_length


@pytest.mark.parametrize(
    "schema", [F1_VALID_TEST, F2_EXAMPLE, F3_ALL_TYPES], ids=["F1", "F2", "F3"]
)
def test_fixture_mock_roundtrip(spark, tmp_path, schema):
    """mock(schema) -> FLF -> parse -> re-encode(plain): byte-identical."""
    path = str(tmp_path / f"{schema.name}.flf")
    Mocker(schema, 300, path, seed=5).run(spark)
    parsed = read_flf(spark, path, schema)
    re_encoded = sorted(
        r.value for r in encode_flf(parsed, schema, float_format="plain").collect()
    )
    original = sorted(
        line
        for p in (tmp_path / f"{schema.name}.flf").glob("part-*.txt")
        for line in p.read_text().splitlines()
    )
    assert re_encoded == original
    assert len(original) == 300


def test_f4_semantics_probes(spark):
    """FIXTURES.md F4 representative rows parse exactly as specified."""
    line = "Åström実験...." + "    -123" + "000000042" + " true " + "__-3.14e2____"
    row = parse_flf(
        spark.createDataFrame([(line,)], ["value"]), F4_EDGE
    ).collect()[0]
    assert (row.uni_name, row.neg_int, row.zero_pad, row.strict) == (
        "Åström実験", -123, 42, True,
    )
    assert row.ctr_f64 == pytest.approx(-314.0)


def test_validate_lists_defects(spark, tmp_path):
    bad = tmp_path / "bad.flf"
    bad.write_text(
        "good........" + "     123" + "000000001" + " true " + "______________" + "\n"
        + "bad........." + "   xx123" + "0000000x1" + " blah " + "______________" + "\n"
    )
    conv = Converter(str(bad), F4_EDGE, "unused")
    defects = conv.validate(spark).collect()
    cols = sorted(d.column for d in defects)
    # row 2: neg_int ('xx123'), zero_pad ('0000000x1'), strict ('blah') all fail
    assert cols == ["neg_int", "strict", "zero_pad"]
    assert all(d.line.startswith("bad") for d in defects)
