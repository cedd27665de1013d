"""Similarity search operators over embedding columns (ARRAY<FLOAT>).

Two tiers, mirroring a production ANN stack:
* ``cosine_topk`` — exact brute force for a bounded probe set (probes
  broadcast against the corpus scan; cost O(probes x corpus), zero corpus
  shuffle). The correctness baseline.
* ``lsh_ann_topk`` — approximate: random-hyperplane buckets bound the
  candidate set per probe to ~corpus/2^planes. The 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from evolution_spark.functions.vectors import cosine, lsh_bucket


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    probe_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors of each probe vector.

    ``probes`` must be small enough to broadcast (it is hinted); ranking is
    deterministic (similarity desc, then neighbor id)."""
    probe_id = probe_id_col or id_col
    p = probes.select(
        F.col(probe_id).alias("probe_id"), F.col(vec_col).alias("__pv")
    )
    scored = (
        corpus.crossJoin(F.broadcast(p))
        .where(F.col(id_col) != F.col("probe_id"))
        .select(
            "probe_id",
            F.col(id_col).alias("neighbor_id"),
            cosine(F.col("__pv"), F.col(vec_col)).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def lsh_ann_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    probe_id_col: str | None = None,
) -> DataFrame:
    """Approximate top-k: probes search only their hyperplane-sign bucket.

    At a billion vectors each probe touches ~corpus/2^planes candidates; the
    join key is the bucket string, so the corpus shuffles once by bucket (or
    not at all when probes broadcast)."""
    probe_id = probe_id_col or id_col
    bucketed = corpus.select(
        F.col(id_col), F.col(vec_col),
        lsh_bucket(F.col(vec_col), n_planes, dim).alias("__bucket"),
    )
    p = probes.select(
        F.col(probe_id).alias("probe_id"),
        F.col(vec_col).alias("__pv"),
        lsh_bucket(F.col(vec_col), n_planes, dim).alias("__bucket"),
    )
    scored = (
        bucketed.join(F.broadcast(p), "__bucket")
        .where(F.col(id_col) != F.col("probe_id"))
        .select(
            "probe_id",
            F.col(id_col).alias("neighbor_id"),
            cosine(F.col("__pv"), F.col(vec_col)).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
