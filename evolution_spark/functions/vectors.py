"""Reusable vector expression library (JVM-side array math).

Dot products are explicit left-to-right double folds so results are
bit-reproducible and match DuckDB's ``list_inner_product(::DOUBLE[])``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from evolution_spark.functions.text import hash32


def dot(a, b) -> Column:
    """Sequential double-precision dot product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def euclidean(a, b) -> Column:
    diff_sq = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))
    )
    return F.sqrt(F.aggregate(diff_sq, F.lit(0.0).cast("double"), lambda s, v: s + v))


def plane_sign(plane: int, dim_index: Column) -> Column:
    """Deterministic pseudo-random +/-1 hyperplane component: md5 parity of
    'plane:dim'. Portable to any engine with md5."""
    h = hash32(F.concat(F.lit(f"{plane}:"), dim_index.cast("string")))
    return F.when(h % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_bucket(vec_col, n_planes: int, dim: int) -> Column:
    """Random-hyperplane LSH bucket key: concatenated sign bits of n_planes
    projections. Scale path for ANN — bucket cardinality ~ corpus/2^planes."""

    def signs_for_plane(j: int):
        return lambda i: plane_sign(j, i)

    bits = []
    for j in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), signs_for_plane(j)),
                lambda x, s: x.cast("double") * s,
            ),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)
