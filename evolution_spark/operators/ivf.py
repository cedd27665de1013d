"""IVF (inverted-file) approximate nearest neighbor: deterministic sampled
centroids -> cell assignment -> probe searches only nprobe nearest cells.

The complementary scale path to hyperplane LSH (operators/similarity.py):
LSH needs no training but gives fixed recall; IVF adapts to the data's
density at the cost of one assignment pass. Both bound per-probe candidate
counts to ~corpus/n_cells x nprobe.

Scale design: centroids (k rows) broadcast everywhere; assignment is one
narrow pass over the corpus (cross join vs the broadcast + min_by — k x dim
flops per row, no shuffle); the search joins probes to cells by cell id.
At a billion vectors the cell assignment materializes once and is reused
(write it partitioned by cell).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from evolution_spark.functions.vectors import cosine, euclidean


def sample_centroids(corpus: DataFrame, id_col: str, vec_col: str, n_cells: int) -> DataFrame:
    """Deterministic centroid sample: the n_cells rows with the smallest
    md5-hash of their id — stable across runs/engines (a k-means refinement
    can replace this without changing the search)."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("bigint")
    w = Window.orderBy(h, F.col(id_col))
    return (
        corpus.select(F.col(id_col), F.col(vec_col), h.alias("__h"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_cells)
        .select(
            F.col("__rn").alias("cell_id"),
            F.col(vec_col).alias("centroid"),
        )
    )


def assign_cells(corpus: DataFrame, centroids: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Attach each vector's nearest centroid (euclidean): cross join against
    the broadcast centroid set + min_by — one narrow pass."""
    scored = corpus.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("cell_id"),
        euclidean(F.col(vec_col), F.col("centroid")).alias("__dist"),
    )
    return scored.groupBy(id_col).agg(
        F.min_by("cell_id", F.struct(F.col("__dist"), F.col("cell_id"))).alias("cell_id"),
        F.first(vec_col).alias(vec_col),
    )


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    probe_id_col: str | None = None,
) -> DataFrame:
    """Approximate top-k: each probe searches its nprobe nearest cells."""
    probe_id = probe_id_col or id_col
    centroids = sample_centroids(corpus, id_col, vec_col, n_cells)
    assigned = assign_cells(corpus, centroids, id_col, vec_col)

    # probes -> their nprobe nearest cells
    p_scored = probes.select(
        F.col(probe_id).alias("probe_id"), F.col(vec_col).alias("__pv")
    ).crossJoin(F.broadcast(centroids)).select(
        "probe_id",
        "__pv",
        "cell_id",
        euclidean(F.col("__pv"), F.col("centroid")).alias("__dist"),
    )
    w = Window.partitionBy("probe_id").orderBy("__dist", "cell_id")
    p_cells = (
        p_scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= nprobe)
        .select("probe_id", "__pv", "cell_id")
    )

    scored = (
        assigned.join(F.broadcast(p_cells), "cell_id")
        .where(F.col(id_col) != F.col("probe_id"))
        .select(
            "probe_id",
            F.col(id_col).alias("neighbor_id"),
            cosine(F.col("__pv"), F.col(vec_col)).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
