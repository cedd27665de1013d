"""JSONL (newline-delimited JSON) source/sink — the lingua franca of LLM
training-data interchange (one JSON object per line; what most open corpora
and data-curation tools emit).

Spark's native json reader/writer IS line-delimited by default, so both
directions are thin wrappers whose value is the enforced discipline:

* ``read_jsonl`` REQUIRES an explicit schema. Schema inference costs a full
  extra pass over the data (fatal at 100 TB) and silently widens types on
  dirty corpora; an explicit schema makes the read single-pass and the
  contract visible. Malformed lines follow ``mode`` (PERMISSIVE nulls them,
  FAILFAST aborts — the converter's abort-vs-permissive dichotomy).
* ``write_jsonl`` is partition-parallel (one .json file per task, same
  layout contract as every other sink here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite", compression: str | None = None) -> None:
    """Write one JSON object per line, one file per partition."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read JSONL with an explicit schema (single-pass; no inference scan).

    ``mode``: PERMISSIVE (bad lines -> nulls), DROPMALFORMED, or FAILFAST
    (abort on the first bad line, mirroring the FLF converter's abort mode).
    """
    return spark.read.schema(schema).option("mode", mode).json(path)
