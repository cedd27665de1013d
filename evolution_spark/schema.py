"""Fixed-length-file (FLF) schema model.

Pure-Python analogue of the reference's ``FixedSchema``/``FixedColumn`` JSON model
(reference: crates/evolution-schema/src/schema.rs:44-96, column.rs:51-69) with the
Spark type mapping of SURVEY.md §1.2. Offsets/lengths are in *runes* (Unicode
codepoints), matching crates/evolution-schema/src/column.rs:55-58; Spark's
``substring`` is codepoint-based on strings, so downstream extraction is faithful.

The JSON format is the reference's template
(examples/full/res/template_schema.json): ``name``, ``version``,
``columns[{name, offset, length, dtype, alignment=Right, pad_symbol=Whitespace,
is_nullable}]``. Invalid documents are rejected like the reference's serde load
(schema.rs:93-96) rejects them.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Iterator

from pyspark.sql.types import (
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
)

# The 9-variant dtype universe (reference: crates/evolution-common/src/datatype.rs:86-96,
# enumerated in examples/full/res/template_schema.json `dtype.enum`).
# Float16 widens to FloatType (Spark has no half type; the reference itself widens
# Float16 -> FLOAT for Delta, column.rs:153-159). LargeUtf8 == Utf8 for Spark
# (offset-width is an Arrow detail with no Spark analogue).
SPARK_DTYPES: dict[str, DataType] = {
    "Boolean": BooleanType(),
    "Float16": FloatType(),
    "Float32": FloatType(),
    "Float64": DoubleType(),
    "Int16": ShortType(),
    "Int32": IntegerType(),
    "Int64": LongType(),
    "Utf8": StringType(),
    "LargeUtf8": StringType(),
}

# Delta-lake dtype names (reference: crates/evolution-schema/src/column.rs:153-168;
# Float16 -> FLOAT is a warn-cast there).
DELTA_DTYPES: dict[str, str] = {
    "Boolean": "boolean",
    "Float16": "float",
    "Float32": "float",
    "Float64": "double",
    "Int16": "short",
    "Int32": "integer",
    "Int64": "long",
    "Utf8": "string",
    "LargeUtf8": "string",
}

# The 21 named pad symbols (examples/full/res/template_schema.json `pad_symbol.enum`;
# the reference sources these from the external `padder` crate v1.2.0).
PAD_SYMBOLS: dict[str, str] = {
    "Hyphen": "-",
    "Underscore": "_",
    "Dot": ".",
    "Comma": ",",
    "Colon": ":",
    "Semicolon": ";",
    "Hashtag": "#",
    "Backslash": "\\",
    "Forwardslash": "/",
    "Asterisk": "*",
    "Whitespace": " ",
    "Zero": "0",
    "One": "1",
    "Two": "2",
    "Three": "3",
    "Four": "4",
    "Five": "5",
    "Six": "6",
    "Seven": "7",
    "Eight": "8",
    "Nine": "9",
}

ALIGNMENTS = ("Left", "Right", "Center")


class SchemaError(ValueError):
    """Raised for invalid FLF schema documents (the reference's serde failure)."""


@dataclass(frozen=True)
class FixedColumn:
    """One fixed-width column (reference: crates/evolution-schema/src/column.rs:51-69).

    ``offset``/``length`` are in runes. ``alignment`` defaults to Right and
    ``pad_symbol`` to Whitespace (serde defaults at column.rs:62-66).
    """

    name: str
    offset: int
    length: int
    dtype: str
    is_nullable: bool
    alignment: str = "Right"
    pad_symbol: str = "Whitespace"

    def __post_init__(self) -> None:
        if not isinstance(self.name, str) or not self.name:
            raise SchemaError("column name must be a non-empty string")
        if self.dtype not in SPARK_DTYPES:
            raise SchemaError(
                f"column {self.name!r}: unknown dtype {self.dtype!r} "
                f"(expected one of {sorted(SPARK_DTYPES)})"
            )
        if self.alignment not in ALIGNMENTS:
            raise SchemaError(
                f"column {self.name!r}: unknown alignment {self.alignment!r}"
            )
        if self.pad_symbol not in PAD_SYMBOLS:
            raise SchemaError(
                f"column {self.name!r}: unknown pad_symbol {self.pad_symbol!r}"
            )
        if not isinstance(self.offset, int) or isinstance(self.offset, bool) or self.offset < 0:
            raise SchemaError(f"column {self.name!r}: offset must be an int >= 0")
        if not isinstance(self.length, int) or isinstance(self.length, bool) or self.length <= 0:
            raise SchemaError(f"column {self.name!r}: length must be an int > 0")
        if not isinstance(self.is_nullable, bool):
            raise SchemaError(f"column {self.name!r}: is_nullable must be a boolean")

    @property
    def pad_char(self) -> str:
        return PAD_SYMBOLS[self.pad_symbol]

    @property
    def spark_type(self) -> DataType:
        return SPARK_DTYPES[self.dtype]

    @property
    def delta_type(self) -> str:
        return DELTA_DTYPES[self.dtype]

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "FixedColumn":
        if not isinstance(d, dict):
            raise SchemaError(f"column entry must be an object, got {type(d).__name__}")
        required = {"name", "offset", "length", "dtype", "is_nullable"}
        missing = required - d.keys()
        if missing:
            raise SchemaError(f"column missing required fields: {sorted(missing)}")
        allowed = required | {"alignment", "pad_symbol"}
        unknown = d.keys() - allowed
        if unknown:
            raise SchemaError(f"column has unknown fields: {sorted(unknown)}")
        return cls(**d)

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "offset": self.offset,
            "length": self.length,
            "dtype": self.dtype,
            "alignment": self.alignment,
            "pad_symbol": self.pad_symbol,
            "is_nullable": self.is_nullable,
        }


@dataclass(frozen=True)
class FixedSchema:
    """Named, versioned, ordered list of FixedColumns
    (reference: crates/evolution-schema/src/schema.rs:44-52).
    """

    name: str
    version: int
    columns: tuple[FixedColumn, ...] = field(default_factory=tuple)

    def __post_init__(self) -> None:
        if not isinstance(self.name, str) or not self.name:
            raise SchemaError("schema name must be a non-empty string")
        if not isinstance(self.version, int) or isinstance(self.version, bool):
            raise SchemaError("schema version must be an integer")
        if not self.columns:
            raise SchemaError("schema must declare at least one column (minItems: 1)")
        seen: set[str] = set()
        for c in self.columns:
            if c.name in seen:
                raise SchemaError(f"duplicate column name {c.name!r}")
            seen.add(c.name)
        # overlap check: encode would otherwise fail late (inside write_flf)
        # with an opaque slot-collision error; catch it at construction
        prev_name, prev_end = None, 0
        for c in sorted(self.columns, key=lambda c: c.offset):
            if c.offset < prev_end:
                raise SchemaError(
                    f"columns {prev_name!r} and {c.name!r} overlap: "
                    f"{c.name!r} starts at offset {c.offset} before "
                    f"{prev_name!r} ends at {prev_end}"
                )
            prev_name, prev_end = c.name, c.offset + c.length

    # -- constructors ------------------------------------------------------

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "FixedSchema":
        if not isinstance(d, dict):
            raise SchemaError(f"schema must be an object, got {type(d).__name__}")
        missing = {"name", "version", "columns"} - d.keys()
        if missing:
            raise SchemaError(f"schema missing required fields: {sorted(missing)}")
        cols = d["columns"]
        if not isinstance(cols, list):
            raise SchemaError("schema 'columns' must be an array")
        return cls(
            name=d["name"],
            version=d["version"],
            columns=tuple(FixedColumn.from_dict(c) for c in cols),
        )

    @classmethod
    def from_json(cls, text: str) -> "FixedSchema":
        try:
            doc = json.loads(text)
        except json.JSONDecodeError as e:
            raise SchemaError(f"invalid JSON: {e}") from e
        return cls.from_dict(doc)

    @classmethod
    def from_path(cls, path: str | Path) -> "FixedSchema":
        """Load from a JSON file (reference: schema.rs:93-96)."""
        return cls.from_json(Path(path).read_text(encoding="utf-8"))

    # -- accessors ---------------------------------------------------------

    def __iter__(self) -> Iterator[FixedColumn]:
        return iter(self.columns)

    def __len__(self) -> int:
        return len(self.columns)

    @property
    def row_length(self) -> int:
        """Total row width in runes, excluding the newline.

        Intentional divergence from reference schema.rs:119-121, which sums
        column *lengths* and ignores offsets: for schemas with inter-column
        gaps the reference under-counts the physical line width, while
        ``max(offset + length)`` is the actual layout extent. The two agree
        on gap-free schemas (every schema the reference ships)."""
        return max((c.offset + c.length) for c in self.columns)

    def column(self, name: str) -> FixedColumn:
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(name)

    def to_spark_schema(self) -> StructType:
        """StructType of the mapped Spark types (replaces ``into_arrow_schema``,
        reference schema.rs:180-188)."""
        return StructType(
            [StructField(c.name, c.spark_type, c.is_nullable) for c in self.columns]
        )

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "version": self.version,
            "columns": [c.to_dict() for c in self.columns],
        }

    def to_json(self, **kwargs: Any) -> str:
        return json.dumps(self.to_dict(), **kwargs)


# The 4-column FLF layout the throughput benchmarks (bench.py flf_mock_1m/
# flf_convert_1m and tools/scale_stress.py's 10x tier) share — ONE
# definition so the two harnesses can never silently measure different
# layouts.
BENCH_FLF_SCHEMA_DICT: dict[str, Any] = {
    "name": "Bench",
    "version": 1,
    "columns": [
        {"name": "id", "offset": 0, "length": 12, "dtype": "Int64",
         "is_nullable": False},
        {"name": "name", "offset": 12, "length": 16, "dtype": "Utf8",
         "is_nullable": False},
        {"name": "score", "offset": 28, "length": 16, "dtype": "Float64",
         "is_nullable": True},
        {"name": "flag", "offset": 44, "length": 6, "dtype": "Boolean",
         "is_nullable": True},
    ],
}
