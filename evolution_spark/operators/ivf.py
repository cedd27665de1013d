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
    can replace this without changing the search).

    Scale shape: ``orderBy().limit()`` compiles to TakeOrderedAndProject
    (distributed per-partition top-k, then a single merge of n_cells-row
    heaps) — NOT a global window, which would funnel the whole corpus
    through one task (the r01 design flaw). Ranks become cell ids by
    packing the tiny result into one sorted array and posexploding."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("bigint")
    top = (
        corpus.select(h.alias("__h"), F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .orderBy("__h", "__id")
        .limit(n_cells)
    )
    packed = top.agg(
        F.sort_array(F.collect_list(F.struct("__h", "__id", "__v"))).alias("__cs")
    )
    return packed.select(F.posexplode("__cs").alias("pos", "c")).select(
        (F.col("pos") + 1).cast("int").alias("cell_id"),
        F.col("c.__v").alias("centroid"),
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    keep_dist_sq: bool = False,
) -> DataFrame:
    """Attach each vector's nearest centroid (euclidean) with ZERO shuffle of
    the corpus: the k centroids are collapsed into one sorted array row,
    broadcast, and the argmin is computed per corpus row as
    ``array_min(transform(...))`` over (dist, cell_id) structs — lexicographic
    struct ordering gives exactly min_by-with-cell_id-tiebreak semantics.

    ``keep_dist_sq`` adds a ``__d2`` column: the winner's squared distance,
    carried through the argmin struct so consumers (inertia, summary
    queries) need no rejoin-and-recompute pass. For integer-grid vectors
    the fold stays in long arithmetic — exact, matching the DuckDB
    oracles' integer sums.

    The r01 version cross-joined then ``groupBy(id)``-ed, shuffling every
    vector by id; this pass is narrow (BroadcastNestedLoopJoin against one
    packed row), so at 100 TB the corpus is read once and never exchanged."""
    packed = centroids.agg(
        F.sort_array(F.collect_list(F.struct("cell_id", "centroid"))).alias("__cells")
    )

    # typed zero from the column's declared element type: the old
    # `lit(0) * element_at(a, 1) * lit(0)` trick evaluated to NULL for
    # NULL-led or empty vectors, silently dropping rows from inertia sums
    elem_type = corpus.schema[vec_col].dataType.elementType.simpleString()

    def d2_same_type(a, b):
        # no double cast: long inputs fold exactly in long arithmetic
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast(elem_type),
            lambda s, v: s + v,
        )

    def entry(c):
        fields = [
            euclidean(F.col(vec_col), c["centroid"]).alias("dist"),
            c["cell_id"].alias("cell_id"),
        ]
        if keep_dist_sq:
            fields.append(d2_same_type(F.col(vec_col), c["centroid"]).alias("d2"))
        return F.struct(*fields)

    best = F.array_min(F.transform(F.col("__cells"), entry))
    cols = [
        F.col(id_col),
        best["cell_id"].alias("cell_id"),
        F.col(vec_col),
    ]
    if keep_dist_sq:
        cols.append(best["d2"].alias("__d2"))
    return corpus.crossJoin(F.broadcast(packed)).select(*cols)


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


def kmeans_refine(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int = 8,
    n_iters: int = 1,
    scale: int = 1000,
):
    """Lloyd k-means refinement of the sampled centroids, on an INTEGER
    grid so every step is exact cross-engine arithmetic (the float vectors
    quantize to ``round(x*scale)`` longs; per-(cell, dim) means are exact
    integer sums divided once, rounded back to the grid).

    Per iteration: one narrow assignment pass (broadcast centroids, argmin
    inside codegen — see ``assign_cells``), one explode + hash-agg on
    (cell_id, dim) for the update (64·n rows of 3 longs — never the raw
    vectors), and a k-row rebuild. Deterministic end-to-end: hash-sampled
    init, lexicographic (dist, cell_id) argmin, fixed rounding; empty
    cells drop out identically in any engine.

    Returns ``(assignments, centroids)``: (id, cell_id, quantized vec) and
    (cell_id, centroid) on the integer grid.

    Lineage bound: each iteration stacks an assignment + two aggregations
    onto the centroid plan, so deep refinement would grow the DAG without
    bound; every 4th iteration the k-row centroid frame is
    ``localCheckpoint``-ed (same remedy as graph.py's label propagation),
    keeping plan depth O(1) for any ``n_iters``.
    """
    # the multiply must run in float64 on BOTH engines: float32 * int keeps
    # float32 precision in Spark, and a product landing a half-ulp across
    # the .5 grid rounds differently than DuckDB's float64 product (seen at
    # sf0.1); float->double cast is exact, so double math is engine-neutral
    vi = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * scale).cast("bigint")
    )
    q = corpus.select(F.col(id_col), vi.alias("__vi"))
    cents = sample_centroids(q, id_col, "__vi", n_cells)
    for it in range(n_iters):
        if it and it % 4 == 0:
            # truncate lineage: cents is k rows, so the checkpoint is
            # k * dim longs — O(centroids), never the corpus
            cents = cents.localCheckpoint(eager=True)
        assigned = assign_cells(q, cents, id_col, "__vi")
        dims = assigned.select("cell_id", F.posexplode("__vi").alias("dim", "val"))
        upd = (
            dims.groupBy("cell_id", "dim")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .select(
                "cell_id",
                "dim",
                F.round(F.col("s") * 1.0 / F.col("n")).cast("bigint").alias("c"),
            )
        )
        cents = (
            upd.groupBy("cell_id")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("__dc"))
            .select(
                "cell_id", F.transform("__dc", lambda t: t["c"]).alias("centroid")
            )
        )
    # materialize the FINAL centroid frame once (k rows of dim longs —
    # O(centroids), never the corpus): it is consumed at least twice (the
    # final assignment's broadcast AND the caller's cents handle), and
    # without the cut each consumer re-derives the whole iteration chain
    # (sample -> assign -> explode -> two aggregations) from scratch
    # (r16 interleaved A/B on the summary query: 3.18 -> 2.37 s min-of-5)
    cents = cents.localCheckpoint(eager=True)
    # the returned assignment carries __d2 (exact long winner distance) so
    # inertia/summary consumers need no rejoin-and-recompute pass
    assigned = assign_cells(q, cents, id_col, "__vi", keep_dist_sq=True)
    return assigned, cents
