"""Range-clustered parquet layout: the data-skipping path for range scans.

Hash bucketing (``io/bucketed.py``) optimizes equi-joins; range clustering
optimizes the other dominant 100 TB access pattern — time/range predicates
(``WHERE l_shipdate BETWEEN ...``). ``repartitionByRange`` gives every
output file a DISJOINT key range (Spark samples the key distribution to
pick balanced boundaries), and ``sortWithinPartitions`` orders rows inside
each file, so parquet's per-file and per-row-group min/max statistics
become tight and non-overlapping. A filtered read then prunes whole files
and row groups from the footer alone — I/O proportional to the selected
range, not the table (the same layout contract a Delta/Iceberg OPTIMIZE
ZORDER targets for the single-column case).

The reference's converter has no layout control at all (one output file,
input order — SURVEY.md O11/O15); this operator is the piece that makes a
converted 100 TB table *queryable* at interactive cost.

``tests/test_converter.py::test_range_clustered_layout`` proves the
contract from the written footers: disjoint per-file ranges, rows sorted
within files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: str | list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet range-clustered on ``cluster_cols``.

    ``n_files`` controls clustering granularity: more files = finer skipping
    but more footers/tasks. Size so one file ≈ one HDFS-block-ish unit at
    target scale (e.g. 100 TB / 1 GB ≈ 100k files); defaults to the session's
    ``spark.sql.shuffle.partitions``.
    """
    cols = [cluster_cols] if isinstance(cluster_cols, str) else list(cluster_cols)
    n = n_files or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )
