"""Dynamic partition overwrite: incremental re-materialization that
rewrites ONLY the partitions present in the incoming batch.

The 100 TB maintenance story: a daily pipeline re-derives the last day or
two (late data, corrections) and must replace exactly those partition
directories — static ``mode("overwrite")`` would truncate the whole
table, and read-merge-rewrite would cost a full pass. Spark's
``spark.sql.sources.partitionOverwriteMode=dynamic`` scopes the overwrite
to partitions the written DataFrame actually contains; every other
directory's files are untouched (byte-for-byte, proven from file listings
in ``tests/test_converter.py::test_dynamic_partition_overwrite``).

This pairs with the other layout operators (``io/bucketed.py`` equi-join
buckets, ``io/clustered.py`` range/Z-order skipping, ``io/ivf_layout.py``
ANN cells): partition dirs are the unit of both pruning AND maintenance.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame


_MODE_KEY = "spark.sql.sources.partitionOverwriteMode"


@contextmanager
def _overwrite_mode(spark, mode: str):
    prior = spark.conf.get(_MODE_KEY, None)
    spark.conf.set(_MODE_KEY, mode)
    try:
        yield
    finally:
        if prior is None:
            spark.conf.unset(_MODE_KEY)
        else:
            spark.conf.set(_MODE_KEY, prior)


def write_partitioned(
    df: DataFrame,
    path: str,
    part_cols: str | list[str],
    mode: str = "overwrite",
) -> None:
    """Initial load: write ``df`` hive-partitioned by ``part_cols``."""
    cols = [part_cols] if isinstance(part_cols, str) else list(part_cols)
    df.write.mode(mode).partitionBy(*cols).parquet(path)


def overwrite_partitions(
    df: DataFrame, path: str, part_cols: str | list[str]
) -> None:
    """Replace exactly the partitions present in ``df``; all other
    partition directories keep their existing files untouched. Cost is
    proportional to the batch, not the table."""
    cols = [part_cols] if isinstance(part_cols, str) else list(part_cols)
    with _overwrite_mode(df.sparkSession, "dynamic"):
        df.write.mode("overwrite").partitionBy(*cols).parquet(path)
