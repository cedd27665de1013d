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
    checkpoint_every: int = 4,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list -> ``(id, rank)``.

    Uses the un-normalized convention (rank = (1-d) + d * Σ contrib, start
    rank 1.0) so results are independent of graph size — the same convention
    GraphX's example implementation documents. ``symmetric=True`` mirrors
    every edge first (undirected graphs, e.g. bipartite co-purchase).

    Scale design: out-degrees are joined into the edge list once; each
    iteration is one join of the current (id, rank) frame to the annotated
    edges on ``src`` plus one sum-by-``dst`` — only (id, rank) pairs ever
    cross the wire, and every iteration shuffles on the same keys. The
    deduplicated edge list is ``localCheckpoint``-ed ONCE up front — the
    loop references it iters+1 times, and without the cut each reference
    would re-derive the whole upstream plan (measured: 20 source scans for
    a 3-iteration run). Rank frames are NOT checkpointed per iteration
    (short runs stay a single job with no materialization barrier); an
    eager cut every ``checkpoint_every`` iterations keeps plan size and
    failure-replay bounded on deep runs. Dangling nodes (no out-edges)
    keep their base rank, matching the convention.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if symmetric:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # one-time degree annotation, hash-partitioned on src and materialized:
    # every iteration's rank join reuses this partitioning (only the small
    # (id, rank) side shuffles per round — the edge list never moves again).
    # The partition count is pinned (r15): a countless keyed repartition is
    # AQE-coalesced on the edge list's bytes (tens of MB -> 1 partition at
    # bench scale), and because this layout is frozen by the checkpoint,
    # EVERY iteration's join+aggregate then runs at that collapsed
    # parallelism — the one-time exchange decides the whole run's.
    # ONE exchange builds the whole annotation (r16, guide §2.4): the src
    # hash layout satisfies the (src, dst) dedup's clustering (subset
    # rule) AND the per-src degree window's, so the old
    # distinct -> groupBy(src) -> join -> repartition chain (3 extra
    # exchanges over the full edge list) folds into
    # repartition -> in-partition dedup -> window count (interleaved A/B
    # on the order-graph query: 3.02 -> 2.14 s min-of-6). Degree values
    # are the same distinct-edge counts; float ranks can differ from the
    # old chain only by summation order (measured <= 7e-15 at sf0.1,
    # vs a 6e-5 distance to any consumer's 6-dp rounding boundary).
    from pyspark.sql import Window

    ann = (
        e.repartition(e.sparkSession.sparkContext.defaultParallelism, "src")
        .dropDuplicates(["src", "dst"])
        .withColumn("__deg", F.count(F.lit(1)).over(Window.partitionBy("src")))
        .localCheckpoint()
    )
    if symmetric:
        # mirrored edge lists make the per-iteration "nodes LEFT JOIN
        # contrib" reinstatement the IDENTITY: every node appears as both
        # src and dst, so (by induction from ranks0 = all nodes) every
        # node receives a contribution every round and the left join
        # attaches nothing. Dropping it removes one join + one exchange
        # per iteration (r16, guide §2.4); the node set itself is just
        # the distinct src side (src set == dst set == node set), so the
        # union-of-both-sides pass and its checkpoint go too. Rank VALUES
        # are unchanged — contrib's join/sum is untouched and the rank
        # expression is the same arithmetic.
        nodes = ann.select(F.col("src").alias("id")).distinct()
    else:
        nodes = (
            ann.select("src").union(ann.select(F.col("dst").alias("src")))
            .distinct()
            .select(F.col("src").alias("id"))
            .localCheckpoint()
        )
    ranks = nodes.select("id", F.lit(1.0).alias("rank"))
    for i in range(iters):
        contrib = (
            ann.join(ranks.withColumnRenamed("id", "src"), "src")
            .select("dst", (F.col("rank") / F.col("__deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        if symmetric:
            ranks = contrib.select(
                F.col("dst").alias("id"),
                (
                    F.lit(1.0 - damping) + F.lit(damping) * F.col("contrib")
                ).alias("rank"),
            )
        else:
            ranks = (
                nodes.join(contrib.withColumnRenamed("dst", "id"), "id", "left")
                .select(
                    "id",
                    (
                        F.lit(1.0 - damping)
                        + F.lit(damping)
                        * F.coalesce(F.col("contrib"), F.lit(0.0))
                    ).alias("rank"),
                )
            )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iters:
            ranks = ranks.localCheckpoint()
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


def project_bipartite(
    edges: DataFrame,
    left: str = "src",
    right: str = "dst",
    max_left_degree: int | None = None,
) -> DataFrame:
    """Project a bipartite graph onto its RIGHT node set: returns
    ``(a, b, shared)`` for every right-node pair (a < b) with ``shared``
    co-neighbors on the left — the co-purchase/co-occurrence graph behind
    collaborative filtering and similarity mining.

    Scale design: the pair explosion is quadratic in LEFT-node degree
    (a customer connected to k suppliers contributes k*(k-1)/2 pairs), so
    ``max_left_degree`` drops hub left-nodes before the self-join — the
    standard guard that turns a web-scale blow-up into a bounded join
    (same role as the hot-gram cap in operators/dedup.py:233). The
    self-join shuffles only (left, right) id pairs, partitioned on the
    left key; output cardinality is sum(k_i^2)/2 over surviving degrees.
    """
    e = edges.select(F.col(left).alias("l"), F.col(right).alias("r")).distinct()
    if max_left_degree is not None:
        ldeg = e.groupBy("l").agg(F.count(F.lit(1)).alias("__ld"))
        e = (
            e.join(ldeg.where(F.col("__ld") <= max_left_degree), "l", "left_semi")
        )
    # explicit-count spread on the join key (r15): the self-join's exchange
    # carries only (left, right) id pairs, so AQE sizes its partition count
    # on a few MB of ids — blind to the k^2-per-left-node pair explosion
    # the join FANS OUT of each partition (measured sf0.1: 23M join rows
    # from 0.6M edges; stage 3.0 s -> 1.8 s once spread). Both join sides
    # derive from this one frame, so the pinned exchange is computed once
    # and reused — same exchange count as before, just not collapsed.
    e = e.repartition(e.sparkSession.sparkContext.defaultParallelism, "l")
    a = e.select("l", F.col("r").alias("a"))
    b = e.select("l", F.col("r").alias("b"))
    return (
        a.join(b, "l")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )


def count_triangles(
    edges: DataFrame, src: str = "src", dst: str = "dst", orient: str = "degree"
) -> DataFrame:
    """Exact triangle count of an undirected simple graph given as an edge
    list — one row ``(n_edges, n_wedges, n_triangles)``.

    Algorithm: orient every edge along a TOTAL order of the vertices (each
    triangle then appears exactly once, ordered o1<o2<o3), join oriented
    edges on the middle vertex to enumerate wedges, and semi-join the
    closing edge. Two shuffles on vertex ids; nothing quadratic in graph
    size — cost tracks the wedge count.

    ``orient='degree'`` (default) orders vertices by (degree, id): every
    edge points from the lower-degree endpoint to the higher, which bounds
    out-degree by O(sqrt(m)) and hence wedges by O(m^1.5) — the standard
    skew-proof orientation (a high-id hub no longer inflates the wedge
    join the way id-ordering lets it). ``orient='id'`` keeps the plain
    (id) order; the TRIANGLE count is identical under any total order
    (only n_wedges differs), which the equivalence test asserts."""
    if orient not in ("degree", "id"):
        raise ValueError(f"orient must be 'degree' or 'id', got {orient!r}")
    # materialized once AT THE INPUT BOUNDARY: the edge list is referenced
    # twice by the symmetrization union and (via sym) by the degree table
    # and orientation join — without the cut every reference re-derives the
    # full upstream, and for a projected similarity graph that upstream is
    # the expensive bipartite self-join (measured: 184 MiB re-read on the
    # co-purchase query before this cut)
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint()
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    if orient == "degree":
        # undirected degree per vertex (sym carries both directions, so a
        # plain count over u IS the degree); broadcast-joined onto the
        # edge list — the degree table is |V|-sized, far under the 64 MiB
        # broadcast threshold for any graph whose edge list fits a cluster
        deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("__d"))
        keep = (
            sym.join(deg.withColumnRenamed("__d", "__du"), "u")
            .join(
                deg.select(F.col("u").alias("v"), F.col("__d").alias("__dv")),
                "v",
            )
            .where(
                (F.col("__du") < F.col("__dv"))
                | ((F.col("__du") == F.col("__dv")) & (F.col("u") < F.col("v")))
            )
            .select("u", "v")
        )
    else:
        keep = sym.where(F.col("u") < F.col("v"))
    # materialized once: the wedge join, the closing semi-join, and the edge
    # count all reference this frame (4 subtree references) — without the
    # cut each one would re-derive the full upstream (for a projected
    # similarity graph, that upstream is the expensive bipartite self-join)
    oriented = keep.localCheckpoint()
    wedges = oriented.select(F.col("u").alias("a"), F.col("v").alias("b")).join(
        oriented.select(F.col("u").alias("b"), F.col("v").alias("c")), "b"
    )
    closed = wedges.join(
        oriented.select(F.col("u").alias("a"), F.col("v").alias("c")),
        ["a", "c"],
        "left_semi",
    )
    return (
        oriented.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(wedges.agg(F.count(F.lit(1)).alias("n_wedges")))
        .crossJoin(closed.agg(F.count(F.lit(1)).alias("n_triangles")))
    )


def bfs_khops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Minimum-hop breadth-first reach from ``sources`` over a directed
    edge list: returns ``(node, hop)`` for every node reachable within
    ``max_hops``, ``hop`` = the first round that reached it (sources are
    hop 0). The level-synchronous BFS every k-hop neighborhood /
    blast-radius / lineage query reduces to.

    Scale design (the Pregel frontier discipline): each round shuffles
    ONLY the current frontier's ids through one join against the edge
    list — never the visited set, never node payloads. The frontier is
    localCheckpoint-ed per round (it is consumed by the expansion join,
    the next round's anti-join, and the result union — without the cut
    each consumer would replay every earlier round), so lineage stays
    O(1) per round exactly like connected_components. The edge list is
    checkpointed once up front: at 100 TB the edge list would instead be
    a bucketed table co-partitioned on ``u`` so every round's join is
    shuffle-free on the edge side."""
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
        # keyed layout on the join key, COUNTLESS (r16): hash-on-u means
        # every round's expansion join reuses this one exchange when the
        # frontier outgrows a broadcast, and AQE sizes the partition count
        # by bytes — coalesced small here, wide at scale. r15 pinned the
        # count to defaultParallelism instead; measured at 32c that only
        # adds ~200 scan tasks across the walk (970 vs 778) for a frontier
        # join that is broadcast anyway at this scale, and it was the real
        # cause of the r15 bfs regression (interleaved A/B: pinned 2.60 s
        # min vs 1.98 unkeyed / 2.58 keyed-countless; r14 two-checkpoint
        # form 2.25). Unlike pagerank's ann frame, nothing here computes
        # AT e's parallelism per round — the per-round aggregates get
        # their parallelism from their own exchanges.
        .repartition("u")
        .localCheckpoint()
    )
    # ONE maintained (node, hop) visited set, checkpointed ONCE per round
    # (r15: the frontier is visited filtered to the last hop — deriving it
    # from the checkpointed union instead of checkpointing it separately
    # halves the per-round materialization jobs). The anti-join is a
    # single join per round (not one per earlier layer, which would be
    # O(max_hops^2) joins over a deep walk), and the checkpoint keeps
    # lineage O(1).
    visited = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("hop", F.lit(0))
        .localCheckpoint()
    )
    for h in range(1, max_hops + 1):
        frontier = visited.where(F.col("hop") == h - 1)
        nxt = (
            frontier.join(e, frontier["node"] == e["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        visited = visited.unionByName(
            nxt.withColumn("hop", F.lit(h))
        ).localCheckpoint()
    return visited
