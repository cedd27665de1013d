"""Product quantization (PQ): compress vectors to m-byte codes and rank
candidates with asymmetric-distance lookups — the memory side of the
billion-scale ANN recipe (IVF narrows the candidate set, PQ shrinks what a
candidate costs to score: 64 floats -> 8 codes here).

Everything runs on the same deterministic integer grid as operators/ivf.py
(quantize to ``round(x*scale)`` longs), so training, encoding, and scoring
are exact cross-engine arithmetic with bit-identical DuckDB oracles.

Scale design mirrors IVF's: the codebook is k sampled vectors (hash-order
``orderBy().limit()`` = TakeOrderedAndProject, never a global window),
broadcast as ONE packed row; encoding is a narrow per-row argmin per
subspace inside codegen (zero corpus shuffle); ADC scoring broadcasts an
m x k literal distance table and reduces each row's codes against it — the
corpus is read once, shuffled never (top-k is TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantized(vec_col: str, scale: int) -> Column:
    # float64 multiply before rounding: exact and engine-neutral (see
    # operators/ivf.py kmeans_refine for the half-ulp rationale)
    return F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * scale).cast("bigint")
    )


def _d2(a: Column, b: Column) -> Column:
    """Exact integer squared euclidean distance of two long arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda s, x: s + x,
    )


def pq_train(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_codes: int = 16,
    scale: int = 1000,
) -> DataFrame:
    """Deterministic PQ training sample: the ``n_codes`` quantized vectors
    with the smallest md5-hash of their id (hash order, id tiebreak — the
    same TakeOrderedAndProject sample as IVF's ``sample_centroids``).
    Subspace codebooks are SLICES of these full vectors, so one sample
    serves every subspace. Returns one packed row ``__pq``: an array of
    (code, full centroid vector) structs sorted by code, ready to
    broadcast."""
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    top = (
        corpus.select(
            h.alias("__h"),
            F.col(id_col).alias("__id"),
            _quantized(vec_col, scale).alias("__vi"),
        )
        .orderBy("__h", "__id")
        .limit(n_codes)
    )
    packed = top.agg(
        F.sort_array(F.collect_list(F.struct("__h", "__id", "__vi"))).alias("__cs")
    )
    return packed.select(
        F.transform(
            F.col("__cs"),
            lambda c, i: F.struct(i.cast("int").alias("code"), c["__vi"].alias("cen")),
        ).alias("__pq")
    )


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    id_col: str,
    vec_col: str,
    n_subspaces: int = 8,
    scale: int = 1000,
) -> DataFrame:
    """Encode each vector as ``n_subspaces`` codes: per subspace j, the
    code of the training vector whose j-th slice is L2-nearest (ties ->
    lowest code, via lexicographic (dist, code) struct min). One narrow
    pass: the packed codebook row is broadcast, the argmin runs per corpus
    row — the corpus is never shuffled.

    NOTE (r16): an ``element_at``-unrolled inner distance (r15) was
    REMOVED after a clean interleaved A/B showed it ~1.7x SLOWER than
    this slice/zip form on the projection-only consumer too (min-of-4
    noop: 3.20 s unrolled+guard / 2.85 s unrolled / 1.84 s sliced at
    sf0.1, 32 cores) — the 128-term flat expression tree defeats codegen
    subexpression reuse, same failure mode as the rejected full unroll
    and the rejected cosine unroll (functions/vectors.py).

    Returns (id, __vi quantized vector, codes array<int>)."""
    sub = F.size(F.col("__pq")[0]["cen"]) / n_subspaces  # dims per subspace

    def code_for(j: Column) -> Column:
        start = (j * sub + 1).cast("int")
        return F.array_min(
            F.transform(
                F.col("__pq"),
                lambda e: F.struct(
                    _d2(
                        F.slice(F.col("__vi"), start, sub.cast("int")),
                        F.slice(e["cen"], start, sub.cast("int")),
                    ).alias("dist"),
                    e["code"].alias("code"),
                ),
            )
        )["code"]

    codes = F.transform(
        F.sequence(F.lit(0), F.lit(n_subspaces - 1)), lambda j: code_for(j)
    )
    return (
        corpus.select(F.col(id_col), _quantized(vec_col, scale).alias("__vi"))
        .crossJoin(F.broadcast(codebook))
        .select(F.col(id_col), F.col("__vi"), codes.alias("codes"))
    )


def pq_adc_topk(
    encoded: DataFrame,
    codebook_rows: list,
    probe_vi: list[int],
    id_col: str,
    n_subspaces: int = 8,
    topk: int = 10,
) -> DataFrame:
    """Asymmetric-distance top-k: precompute the m x k table of exact
    integer partial distances (probe slice vs every subspace centroid) from
    the tiny collected codebook, ship it as a literal, and score each row
    as ``sum_j table[j][codes[j]]`` — k*dims integer ops ONCE on the
    driver, then m lookups per corpus row, no shuffle, top-k via
    TakeOrderedAndProject.

    ``codebook_rows``: the collected packed codebook (list of (code, cen)
    rows); ``probe_vi``: the probe's quantized vector (collect it from the
    same Spark expression that quantizes the corpus, so rounding is
    identical)."""
    dims = len(probe_vi)
    sub = dims // n_subspaces
    table = [
        [
            sum(
                (probe_vi[j * sub + i] - cen[j * sub + i]) ** 2
                for i in range(sub)
            )
            for _code, cen in sorted(codebook_rows)
        ]
        for j in range(n_subspaces)
    ]
    from evolution_spark.functions.vectors import lit_long_array

    lit_table = F.array(*[lit_long_array(row) for row in table])
    partials = F.zip_with(
        lit_table, F.col("codes"), lambda row, c: F.element_at(row, c + 1)
    )
    score = F.aggregate(
        partials, F.lit(0).cast("bigint"), lambda s, x: s + x
    )
    return (
        encoded.select(F.col(id_col), score.alias("adc_score"))
        .orderBy("adc_score", id_col)
        .limit(topk)
    )
