"""Timestamp helpers that work on both TIMESTAMP and TIMESTAMP_NTZ.

Parquet files carry timezone-naive ``timestamp[us]`` columns (the driver's
``events.ts``), which Spark 4 reads as TIMESTAMP_NTZ — a type
``unix_micros`` rejects outright (DATATYPE_MISMATCH). The NTZ path below
measures micros with ``timestampdiff`` against an NTZ epoch literal: pure
naive-wall-clock arithmetic, independent of ``spark.sql.session.timeZone``,
and bit-identical to DuckDB's ``epoch_us`` on its (naive) TIMESTAMP type.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPOCH_NTZ = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"


def micros_since_epoch(df: DataFrame, col: str) -> Column:
    """Microseconds since the epoch for ``df[col]``, NTZ-safe.

    TIMESTAMP uses ``unix_micros`` (instant-based); TIMESTAMP_NTZ uses
    naive-wall-clock ``timestampdiff`` from the epoch, which is what a
    naive-timestamp engine (DuckDB, pandas) computes. Both are single JVM
    expressions inside whole-stage codegen.
    """
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        return F.expr(f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, `{col}`)")
    return F.unix_micros(F.col(col))
