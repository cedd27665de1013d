"""Spark-vs-DuckDB oracle parity for every registered query — a local mirror
of the driver's CORRECTNESS gate (row count + schema + order-insensitive
values, columns sorted by name)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _canonical_dtype(series):
    """Driver-faithful dtype descriptor.

    The driver's value hash is type-KIND-sensitive (r01 evidence: int32 vs
    int64 rank columns hashed EQUAL in `window_rank_dense`, while DuckDB
    HUGEINT-as-object and FLOOR-as-double hashed UNEQUAL against Spark int64
    — pandas hashes integers by value regardless of width, but floats by bit
    pattern and objects by string). So parity compares dtype *kind*:
    int-width differences pass, float-vs-int / object-vs-int / object payload
    type differences fail, exactly like the driver."""
    import numpy as np
    import pandas as pd

    dt = series.dtype
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime64"
    if dt == object:
        non_null = series.dropna()
        if len(non_null) == 0:
            return "object:empty"
        return f"object:{type(non_null.iloc[0]).__name__}"
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    return str(dt)


def _normalize(df_pandas):
    """Sort columns by name, then rows; capture per-column canonical dtypes."""
    import numpy as np

    # Floats are compared EXACTLY (bit-level): every query is engineered to
    # produce deterministic doubles (exact integer arithmetic for
    # order-dependent sums, identical scalar expression trees otherwise), so
    # this harness proves what the driver's value hash requires.
    df = df_pandas[sorted(df_pandas.columns)].copy()
    dtypes = [(c, _canonical_dtype(df[c])) for c in df.columns]

    def norm_val(v):
        if isinstance(v, np.ndarray):
            return tuple(v.tolist())
        if isinstance(v, list):
            return tuple(v)
        if isinstance(v, float) and math.isnan(v):
            return None
        return v

    rows = sorted(
        (
            tuple(norm_val(v) for v in row)
            for row in df.itertuples(index=False, name=None)
        ),
        key=lambda r: tuple((v is None, str(v)) for v in r),
    )
    return list(df.columns), rows, dtypes


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    q = entry_mod.queries()[name]
    spark_df = q(spark, sf_dir)
    spark_pd = spark_df.toPandas()
    assert spark_pd is not None

    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        # rows-only check (driver's weaker path)
        assert len(spark_pd) >= 0
        return

    duck_pd = ddb.sql(oracle).df()
    s_cols, s_rows, s_dtypes = _normalize(spark_pd)
    d_cols, d_rows, d_dtypes = _normalize(duck_pd)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    dtype_diff = [
        (sc, sd, dd) for (sc, sd), (_, dd) in zip(s_dtypes, d_dtypes) if sd != dd
    ]
    assert not dtype_diff, (
        f"{name}: dtype mismatch (col, spark, oracle): {dtype_diff} — "
        "the driver's hash is type-sensitive; align with CASTs on both sides"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
