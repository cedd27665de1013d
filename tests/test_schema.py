import json

import pytest

from pyspark.sql.types import (
    BooleanType,
    FloatType,
    IntegerType,
    StringType,
)

from evolution_spark.schema import FixedColumn, FixedSchema, SchemaError

VALID = {
    "name": "ValidTestSchema",
    "version": 1337,
    "columns": [
        {"name": "id", "offset": 0, "length": 9, "dtype": "Int32",
         "alignment": "Right", "pad_symbol": "Whitespace", "is_nullable": False},
        {"name": "name", "offset": 9, "length": 32, "dtype": "Utf8",
         "alignment": "Right", "pad_symbol": "Whitespace", "is_nullable": False},
        {"name": "employed", "offset": 41, "length": 5, "dtype": "Boolean",
         "alignment": "Right", "pad_symbol": "Hyphen", "is_nullable": True},
        {"name": "hours", "offset": 46, "length": 20, "dtype": "Float16",
         "alignment": "Center", "pad_symbol": "Underscore", "is_nullable": False},
    ],
}


def test_load_valid_schema():
    s = FixedSchema.from_json(json.dumps(VALID))
    assert s.name == "ValidTestSchema"
    assert s.version == 1337
    assert len(s) == 4
    assert s.row_length == 66
    assert s.column("employed").pad_char == "-"
    assert s.column("hours").alignment == "Center"


def test_defaults_applied():
    s = FixedSchema.from_dict(
        {"name": "d", "version": 1,
         "columns": [{"name": "a", "offset": 0, "length": 3, "dtype": "Utf8",
                      "is_nullable": True}]}
    )
    c = s.column("a")
    assert c.alignment == "Right" and c.pad_symbol == "Whitespace"


def test_spark_schema_mapping():
    s = FixedSchema.from_dict(VALID)
    st = s.to_spark_schema()
    assert st.fields[0].dataType == IntegerType()
    assert st.fields[1].dataType == StringType()
    assert st.fields[2].dataType == BooleanType()
    assert st.fields[3].dataType == FloatType()  # Float16 widens
    assert st.fields[0].nullable is False
    assert st.fields[2].nullable is True


def test_roundtrip_json():
    s = FixedSchema.from_dict(VALID)
    assert FixedSchema.from_json(s.to_json()) == s


@pytest.mark.parametrize(
    "mutate",
    [
        lambda d: d.pop("name"),
        lambda d: d.pop("columns"),
        lambda d: d.update(columns=[]),
        lambda d: d["columns"][0].pop("dtype"),
        lambda d: d["columns"][0].update(dtype="Decimal"),
        lambda d: d["columns"][0].update(alignment="Middle"),
        lambda d: d["columns"][0].update(pad_symbol="Emoji"),
        lambda d: d["columns"][0].update(offset=-1),
        lambda d: d["columns"][0].update(length=0),
        lambda d: d["columns"][0].update(bogus=1),
        lambda d: d["columns"].append(dict(d["columns"][0])),
    ],
)
def test_invalid_schemas_rejected(mutate):
    doc = json.loads(json.dumps(VALID))
    mutate(doc)
    with pytest.raises(SchemaError):
        FixedSchema.from_dict(doc)


def test_invalid_json_rejected():
    with pytest.raises(SchemaError):
        FixedSchema.from_json("{not json,}")


def test_delta_type_mapping():
    # reference column.rs:153-168 incl. Float16 -> float warn-cast
    assert FixedColumn("a", 0, 1, "Float16", True).delta_type == "float"
    assert FixedColumn("a", 0, 1, "LargeUtf8", True).delta_type == "string"
    assert FixedColumn("a", 0, 1, "Int16", True).delta_type == "short"


def test_overlapping_columns_rejected():
    bad = json.loads(json.dumps(VALID))
    bad["columns"][1]["offset"] = 5  # starts inside 'id' (0..9)
    with pytest.raises(SchemaError, match="overlap"):
        FixedSchema.from_json(json.dumps(bad))


def test_gap_schema_row_length_is_layout_extent():
    gapped = json.loads(json.dumps(VALID))
    gapped["columns"][3]["offset"] = 50  # 4-rune gap after 'employed'
    s = FixedSchema.from_json(json.dumps(gapped))
    assert s.row_length == 70  # max(offset+length), not sum-of-lengths (66)
