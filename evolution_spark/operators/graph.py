"""Iterative graph operators: distributed connected components.

The missing last step of a near-dedup pipeline: MinHash-LSH / n-gram Jaccard
emit *pairs*, but deleting duplicates needs *clusters* — doc A~B and B~C must
collapse to one keeper even though A~C was never emitted. That closure is
connected components over the similarity graph.

Scale design: label propagation to a fixpoint (the HashToMin scheme), all
DataFrame ops. Per iteration: one join + one min-aggregation, shuffling ONLY
(id, label) pairs — never document payloads. Iteration count is the graph
diameter; dedup similarity graphs are near-cliques (diameter 2-4), so the
loop converges in a handful of rounds. Each iteration ``localCheckpoint``s
the label frame: lineage stays O(1) instead of O(iterations), which is what
keeps plan compilation and failure recovery bounded on a 1000-executor run.
(GraphFrames ships the same algorithm; re-built here from DataFrame
primitives to stay dependency-free.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components of an undirected graph given as an edge list.

    Returns ``(id, component)`` for every vertex that appears in an edge,
    where ``component`` is the MINIMUM vertex id of the component — i.e. the
    canonical representative (for dedup: the document to keep).

    Label propagation: every vertex starts labeled with itself; each round a
    vertex takes the min label among itself and its neighbors; converged when
    no label changes. Labels only decrease, so the fixpoint is exact (not
    heuristic) and ``max_iter`` is a safety bound, not a quality knob.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_labels = sym.join(
            labels.select(F.col("id").alias("b"), F.col("component").alias("nc")), "b"
        ).select(F.col("a").alias("id"), "nc")
        proposed = (
            neighbor_labels.unionByName(
                labels.select("id", F.col("component").alias("nc"))
            )
            .groupBy("id")
            .agg(F.min("nc").alias("new_component"))
        )
        # one materialization per round; the convergence probe and the next
        # round's labels both read it (no recomputation of the join)
        delta = (
            labels.join(proposed, "id")
            .select("id", "component", "new_component")
            .localCheckpoint()
        )
        labels = delta.select("id", F.col("new_component").alias("component"))
        if delta.where(F.col("new_component") != F.col("component")).limit(1).count() == 0:
            break
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    symmetric: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list -> ``(id, rank)``.

    Uses the un-normalized convention (rank = (1-d) + d * Σ contrib, start
    rank 1.0) so results are independent of graph size — the same convention
    GraphX's example implementation documents. ``symmetric=True`` mirrors
    every edge first (undirected graphs, e.g. bipartite co-purchase).

    Scale design: out-degrees are computed once and joined into the edge
    list ONCE, so each iteration is exactly one shuffle — join current ranks
    to the degree-annotated edges on ``src`` (hash-partitioned the same way
    every round, so AQE reuses the exchange), then sum contributions by
    ``dst``. Only (id, rank) pairs ever cross the wire; the edge list is
    ``localCheckpoint``-ed so the per-iteration lineage stays O(1) and a
    lost executor replays one round, not the whole loop. Dangling nodes
    (no out-edges) keep their base rank, matching the convention.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if symmetric:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    # one-time degree annotation; the loop below never re-joins degrees
    ann = e.join(deg, "src").localCheckpoint()
    nodes = (
        e.select("src").union(e.select(F.col("dst").alias("src"))).distinct()
        .select(F.col("src").alias("id"))
    )
    ranks = nodes.select("id", F.lit(1.0).alias("rank")).localCheckpoint()
    for _ in range(iters):
        contrib = (
            ann.join(ranks.withColumnRenamed("id", "src"), "src")
            .select("dst", (F.col("rank") / F.col("__deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def dedup_clusters(
    pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b"
) -> DataFrame:
    """Near-dup pairs -> ``(doc_id, component, is_keeper)``: the transitive
    closure of the pair relation, with the min doc_id of each cluster as the
    keeper. Documents not in any pair are unique by definition and are not
    returned (semi-join survivors)."""
    comp = connected_components(pairs, src=id_a, dst=id_b)
    return comp.select(
        F.col("id").alias("doc_id"),
        "component",
        (F.col("id") == F.col("component")).alias("is_keeper"),
    )
