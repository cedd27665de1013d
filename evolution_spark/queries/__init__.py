"""Query registry: the engine's declared query surface (SURVEY.md §2.3).

Every entry appears in ``__spark_entry__.queries()`` and (when
SQL-expressible) ``__spark_entry__.oracle_sql()`` for the DuckDB correctness
gate. Importing this package populates the registries from the submodules.
"""

from evolution_spark.queries.base import ORACLES, QUERIES, query, table

# Submodule imports populate the registries (order = display order).
from evolution_spark.queries import relational  # noqa: E402,F401
from evolution_spark.queries import relational2  # noqa: E402,F401
from evolution_spark.queries import relational3  # noqa: E402,F401
from evolution_spark.queries import relational4  # noqa: E402,F401
from evolution_spark.queries import events  # noqa: E402,F401
from evolution_spark.queries import text  # noqa: E402,F401
from evolution_spark.queries import vectors  # noqa: E402,F401
from evolution_spark.queries import flf_queries  # noqa: E402,F401
from evolution_spark.queries import temporal_queries  # noqa: E402,F401
from evolution_spark.queries import extensions  # noqa: E402,F401
from evolution_spark.queries import pipeline  # noqa: E402,F401
from evolution_spark.queries import ranking  # noqa: E402,F401
from evolution_spark.queries import formats  # noqa: E402,F401
from evolution_spark.queries import quality  # noqa: E402,F401
from evolution_spark.queries import analytics  # noqa: E402,F401
from evolution_spark.queries import analytics2  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query", "table"]
