"""The FLF converter surfaced as oracle-checkable queries.

``flf_roundtrip_customer`` runs the full reference dataflow — encode typed
rows to fixed-width lines (O13) then parse them back (O3-O10) — inside one
query; its oracle is the *identity* projection, so any loss anywhere in the
pad/trim/cast pipeline hash-mismatches.

``flf_parse_expression`` checks the parse expressions themselves against a
DuckDB substr/trim/cast reimplementation on lines built with SQL string
concatenation in both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from evolution_spark.queries.base import query, table
from evolution_spark.io.flf import encode_flf, parse_flf
from evolution_spark.schema import FixedSchema

CUSTOMER_FLF = FixedSchema.from_dict(
    {
        "name": "CustomerFLF",
        "version": 1,
        "columns": [
            {"name": "c_custkey", "offset": 0, "length": 12, "dtype": "Int64",
             "alignment": "Right", "pad_symbol": "Whitespace", "is_nullable": False},
            {"name": "c_name", "offset": 12, "length": 30, "dtype": "Utf8",
             "alignment": "Left", "pad_symbol": "Whitespace", "is_nullable": False},
            {"name": "c_nationkey", "offset": 42, "length": 6, "dtype": "Int32",
             "alignment": "Right", "pad_symbol": "Zero", "is_nullable": False},
            {"name": "c_acctbal", "offset": 48, "length": 18, "dtype": "Float64",
             "alignment": "Right", "pad_symbol": "Whitespace", "is_nullable": True},
            {"name": "c_mktsegment", "offset": 66, "length": 12, "dtype": "Utf8",
             "alignment": "Center", "pad_symbol": "Underscore", "is_nullable": True},
        ],
    }
)


@query(
    "flf_roundtrip_customer",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey,
           ROUND(c_acctbal, 2) AS acctbal, c_mktsegment
    FROM customer
    """,
)
def flf_roundtrip_customer(spark, sf_dir):
    """customer -> fixed-width lines -> parsed back; identity oracle. Covers
    encode (pad/align O13) + parse (extract/trim/cast O3-O10) in one narrow
    two-projection pipeline."""
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    lines = encode_flf(c, CUSTOMER_FLF, float_format="plain")
    parsed = parse_flf(lines, CUSTOMER_FLF)
    return parsed.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        "c_mktsegment",
    )


@query(
    "flf_parse_expression",
    oracle="""
    WITH lines AS (
      SELECT lpad(CAST(o_orderkey AS VARCHAR), 14, '_')
             || rpad(o_orderpriority, 16, '.')
             || lpad(CAST(ROUND(o_totalprice, 2) AS VARCHAR), 20, ' ') AS line
      FROM orders
    )
    SELECT CAST(regexp_replace(substr(line, 1, 14), '^_+', '') AS BIGINT) AS orderkey,
           regexp_replace(substr(line, 15, 16), '\\.+$', '') AS priority,
           CAST(trim(substr(line, 31, 20)) AS DOUBLE) AS totalprice
    FROM lines
    """,
)
def flf_parse_expression(spark, sf_dir):
    """Build fixed-width lines from ``orders`` with lpad/rpad (the encode
    primitives) and parse them back with the engine's parse_flf — the oracle
    rebuilds the same lines and re-parses with substr/trim/cast."""
    sch = FixedSchema.from_dict(
        {
            "name": "OrdersFLF",
            "version": 1,
            "columns": [
                {"name": "orderkey", "offset": 0, "length": 14, "dtype": "Int64",
                 "alignment": "Right", "pad_symbol": "Underscore", "is_nullable": False},
                {"name": "priority", "offset": 14, "length": 16, "dtype": "Utf8",
                 "alignment": "Left", "pad_symbol": "Dot", "is_nullable": False},
                {"name": "totalprice", "offset": 30, "length": 20, "dtype": "Float64",
                 "alignment": "Right", "pad_symbol": "Whitespace", "is_nullable": True},
            ],
        }
    )
    o = table(spark, sf_dir, "orders")
    lines = o.select(
        F.concat(
            F.lpad(F.col("o_orderkey").cast("string"), 14, "_"),
            F.rpad("o_orderpriority", 16, "."),
            F.lpad(F.round("o_totalprice", 2).cast("string"), 20, " "),
        ).alias("value")
    )
    return parse_flf(lines, sch)


@query("flf_mock_generate")  # no oracle: Spark-seeded randomness
def flf_mock_generate(spark, sf_dir):
    """Mock generation smoke (O14): generate 1000 rows of the AllTypes-style
    schema and return per-column range stats. Rows-only driver check (the
    generator's rand(seed) stream is Spark-specific)."""
    from evolution_spark.mocker import Mocker

    sch = FixedSchema.from_dict(
        {
            "name": "MockStats",
            "version": 1,
            "columns": [
                {"name": "m_bool", "offset": 0, "length": 6, "dtype": "Boolean", "is_nullable": False},
                {"name": "m_i32", "offset": 6, "length": 11, "dtype": "Int32", "is_nullable": False},
                {"name": "m_f64", "offset": 17, "length": 16, "dtype": "Float64", "is_nullable": False},
                {"name": "m_name", "offset": 33, "length": 12, "dtype": "Utf8", "is_nullable": False},
            ],
        }
    )
    df = Mocker(sch, 1000, output_path="unused", seed=7).dataframe(spark)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("m_bool").cast("int")).alias("n_true"),
        F.min("m_i32").alias("min_i32"),
        F.max("m_i32").alias("max_i32"),
        F.countDistinct("m_name").alias("n_names"),
    )
