"""Cell-partitioned IVF corpus layout: partition pruning for ANN search.

At billion-vector scale the IVF win is not the per-row cell filter (that
still READS every vector) but the storage layout: write the corpus
hive-partitioned by ``cell_id`` so a search that probes ``nprobe`` of
``n_cells`` cells lists only those directories — the scan's
``PartitionFilters`` prune every other cell before a single byte of vector
data is read. I/O per query drops from O(corpus) to
O(corpus * nprobe / n_cells), which is the property that makes IVF an
index rather than a predicate.

This is the vector-search twin of the engine's clustered-read story
(``io/clustered.py``): hash buckets co-locate join keys, range clusters
tighten min/max footers, and IVF cells turn centroid proximity into
directory structure. The reference engine has no layout control at all
(single-file output, input order — SURVEY.md O11/O15).

Scale notes:
- The pre-write ``repartition(cell_col)`` gives each task a handful of
  whole cells, so ``partitionBy`` opens one writer per cell per task
  instead of (tasks x cells) writers producing a small-file explosion.
- Within each cell, rows sort by ``sort_col`` (default the id) so parquet
  row-group stats stay tight for secondary lookups.
- Reads MUST filter with a literal ``cell_id`` predicate (``isin``) —
  that is what Spark's Hive-partition discovery converts to directory
  pruning; a join against a cells table would scan everything.

``tests/test_plans.py::test_ivf_partitioned_scan_prunes_cells`` proves
the contract from the plan: ``PartitionFilters`` carries the cell
predicate and the data filters stay empty.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_ivf_partitioned(
    df: DataFrame,
    path: str,
    cell_col: str = "cell_id",
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write an IVF-assigned corpus (e.g. the output of
    ``operators.ivf.assign_cells``) hive-partitioned by ``cell_col``.

    One shuffle clusters rows by cell; each task then writes whole cells,
    so the layout lands as ``path/cell_id=<k>/part-*.parquet`` with one
    file per cell per task — the directory tree IS the IVF index.
    """
    clustered = df.repartition(F.col(cell_col))
    if sort_col is not None:
        clustered = clustered.sortWithinPartitions(sort_col)
    clustered.write.mode(mode).partitionBy(cell_col).parquet(path)


def read_ivf_cells(
    spark: SparkSession,
    path: str,
    cell_ids: Sequence[int] | None = None,
    cell_col: str = "cell_id",
) -> DataFrame:
    """Read an IVF-partitioned corpus, pruned to ``cell_ids``.

    The ``isin`` predicate on the partition column becomes
    ``PartitionFilters`` on the scan: directories for non-probed cells are
    never listed past discovery, so I/O is proportional to the probed
    fraction of the corpus. ``cell_ids=None`` reads every cell (for
    maintenance jobs — rebalancing, re-training)."""
    df = spark.read.parquet(path)
    if cell_ids is not None:
        df = df.where(F.col(cell_col).isin(list(cell_ids)))
    return df
