"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1-shape pricing summary) on
sf0.001. ``queries()``/``oracle_sql()`` expose the engine's full declared
query surface (SURVEY.md §2.3): all 22 TPC-H shapes, date/window analytics,
temporal joins (as-of/range), text analysis + dedup (exact, MinHash-LSH,
n-gram Jaccard, SimHash), embedding similarity (brute-force + LSH ANN + IVF)
and compression (int8, random projection), dataset curation (splits,
sampling, scrubbing, chunking), streaming batch twins (windows, sessions,
stream-join attribution), and the FLF converter itself surfaced as
identity-oracle queries.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the package importable regardless of the driver's CWD.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from evolution_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted entries are
    non-SQL-expressible and get the driver's rows-only check)."""
    return dict(ORACLES)
