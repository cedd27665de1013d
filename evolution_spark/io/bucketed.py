"""Bucketed (hash-clustered) tables: the shuffle-free co-located join path.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both sides
on the join key. Writing both tables bucketed (and sorted) by that key moves
the shuffle to WRITE TIME, once; every subsequent join/aggregation on the
key is then exchange-free — Spark's bucketing metadata proves both sides are
already hash-partitioned identically, and ``sortBy`` removes the sort of the
sort-merge join too. This is the batch analogue of the reference's
"pre-partitioned worker chunks" (SURVEY.md O2), promoted to a persistent
table property.

``tests/test_plans.py::test_bucketed_join_is_shuffle_free`` asserts the plan
property (no Exchange on either side of the join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    key: str | list[str],
    n_buckets: int = 16,
    sorted_by_key: bool = True,
) -> None:
    """Persist ``df`` as an external bucketed parquet table named ``name`` at
    ``path``, hash-clustered into ``n_buckets`` files per partition by
    ``key``. Pick n_buckets so one bucket of the LARGER table fits an
    executor core's working set (e.g. 100 TB / 16k buckets ≈ 6 GB); both
    sides of a co-located join must use the same n_buckets and key."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.bucketBy(n_buckets, *keys)
    if sorted_by_key:
        writer = writer.sortBy(*keys)
    writer.option("path", path).mode("overwrite").saveAsTable(name)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table back WITH its bucketing metadata (a plain
    ``spark.read.parquet(path)`` would lose it — the catalog carries the
    bucket spec, so always read bucketed data through the table name)."""
    return spark.table(name)
