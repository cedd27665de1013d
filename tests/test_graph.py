"""Connected-components operator: exact fixpoint, multi-round convergence,
and the dedup-clusters wrapper."""

from __future__ import annotations

from pyspark.sql import functions as F

from evolution_spark.operators.graph import connected_components, dedup_clusters


def _components(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.id: r.component for r in connected_components(df).collect()}


def test_two_cliques(spark):
    comp = _components(spark, [(1, 2), (2, 3), (1, 3), (10, 11)])
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_needs_multiple_rounds(spark):
    # path graph 0-1-2-...-12: diameter 12 forces several propagation rounds
    comp = _components(spark, [(i, i + 1) for i in range(12)])
    assert comp == {i: 0 for i in range(13)}


def test_direction_and_duplicates_ignored(spark):
    comp = _components(spark, [(5, 4), (4, 5), (4, 3), (3, 5), (9, 8)])
    assert comp == {3: 3, 4: 3, 5: 3, 8: 8, 9: 8}


def test_dedup_clusters_keeper(spark):
    pairs = spark.createDataFrame(
        [(100, 200), (200, 300), (7, 9)], "doc_a long, doc_b long"
    )
    rows = {r.doc_id: r for r in dedup_clusters(pairs).collect()}
    assert rows[100].is_keeper and rows[100].component == 100
    assert not rows[300].is_keeper and rows[300].component == 100
    assert rows[7].is_keeper and not rows[9].is_keeper
    # the delete set is exactly the non-keepers
    assert sorted(d for d, r in rows.items() if not r.is_keeper) == [9, 200, 300]


# --------------------------------------------------------------------------
# PageRank
# --------------------------------------------------------------------------

from evolution_spark.operators.graph import pagerank  # noqa: E402


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.id: r.rank for r in pagerank(df, **kw).collect()}


def test_pagerank_symmetric_pair_is_uniform(spark):
    # two nodes linked both ways: ranks stay at the fixpoint 1.0 every round
    r = _ranks(spark, [("a", "b")], symmetric=True, iters=4)
    assert r["a"] == r["b"]
    assert abs(r["a"] - 1.0) < 1e-12


def test_pagerank_star_center_dominates(spark):
    # undirected star: the hub must outrank every leaf, leaves tie exactly
    edges = [("hub", f"leaf{i}") for i in range(6)]
    r = _ranks(spark, edges, symmetric=True, iters=5)
    leaves = [v for k, v in r.items() if k != "hub"]
    assert r["hub"] > max(leaves) * 2
    assert max(leaves) - min(leaves) < 1e-12


def test_pagerank_dangling_node_keeps_base_rank(spark):
    # directed a->b: a receives nothing, rank (1-d); b receives a's full mass
    r = _ranks(spark, [("a", "b")], iters=3, damping=0.85)
    assert abs(r["a"] - 0.15) < 1e-12
    assert r["b"] > r["a"]


def test_pagerank_matches_reference_power_iteration(spark):
    # dense 4-node digraph vs a driver-side numpy power iteration
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]
    r = _ranks(spark, edges, iters=10)
    ranks = {n: 1.0 for n in "abcd"}
    out = {"a": ["b", "c"], "b": ["c"], "c": ["a"], "d": ["c"]}
    for _ in range(10):
        contrib = {n: 0.0 for n in ranks}
        for src, dsts in out.items():
            for dst in dsts:
                contrib[dst] += ranks[src] / len(dsts)
        ranks = {n: 0.15 + 0.85 * contrib[n] for n in ranks}
    for n in "abcd":
        assert abs(r[n] - ranks[n]) < 1e-9, (n, r[n], ranks[n])


# --------------------------------------------------------------------------
# Bipartite projection + triangle counting
# --------------------------------------------------------------------------

from evolution_spark.operators.graph import count_triangles, project_bipartite  # noqa: E402


def test_project_bipartite_shared_counts(spark):
    edges = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10), (2, 20), (2, 30), (3, 30)], "c long, s long"
    )
    got = {
        (r.a, r.b): r.shared
        for r in project_bipartite(edges, "c", "s").collect()
    }
    assert got == {(10, 20): 2, (10, 30): 1, (20, 30): 1}


def test_project_bipartite_hub_cap_drops_blowup(spark):
    # customer 99 connects to every supplier: capped out, contributes no pairs
    rows = [(99, s) for s in range(50)] + [(1, 0), (1, 1)]
    edges = spark.createDataFrame(rows, "c long, s long")
    got = project_bipartite(edges, "c", "s", max_left_degree=10).collect()
    assert {(r.a, r.b, r.shared) for r in got} == {(0, 1, 1)}


def test_count_triangles_known_graphs(spark):
    def tri(edges):
        df = spark.createDataFrame(edges, "u long, v long")
        return count_triangles(df, "u", "v").collect()[0]

    # triangle
    r = tri([(1, 2), (2, 3), (1, 3)])
    assert (r.n_edges, r.n_triangles) == (3, 1)
    # K4 has 4 triangles
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = tri(k4)
    assert (r.n_edges, r.n_triangles) == (6, 4)
    # path graph: none; duplicate/reversed edges must not inflate
    r = tri([(1, 2), (2, 3), (3, 2), (2, 1)])
    assert (r.n_edges, r.n_triangles) == (2, 0)


def test_count_triangles_degree_vs_id_orientation(spark):
    """The triangle count is identical under any total-order orientation;
    only the wedge count differs. On a skewed graph (hub with the HIGHEST
    id, so id-orientation points every spoke edge AT the hub and then
    fans out), degree orientation must strictly reduce wedges."""
    # hub 1000 with a MIDDLE id: 15 lower-id spokes point in under id
    # order, 15 higher-id spokes point out -> 15*15=225 wedges route
    # THROUGH the hub as middle vertex (the in*out inflation), plus the
    # 0-1-2 triangle's 4. Degree orientation points every spoke edge INTO
    # the max-degree hub -> hub out-degree 0 -> hub wedges vanish.
    edges = (
        [(s, 1000) for s in range(15)]
        + [(1000, s) for s in range(2000, 2015)]
        + [(0, 1), (1, 2), (0, 2)]
    )
    df = spark.createDataFrame(edges, "u long, v long")
    r_deg = count_triangles(df, "u", "v", orient="degree").collect()[0]
    r_id = count_triangles(df, "u", "v", orient="id").collect()[0]
    assert r_deg.n_edges == r_id.n_edges == 33
    # triangles: (0,1,2) + (0,1,hub) + (1,2,hub) + (0,2,hub)
    assert r_deg.n_triangles == r_id.n_triangles == 4
    assert r_id.n_wedges == 229      # hub-inflated
    assert r_deg.n_wedges == 4       # skew engineered out


def test_bfs_khops_min_hop_semantics(spark):
    """hop = FIRST round that reaches the node, even when longer paths
    exist; unreached nodes are absent; sources are hop 0."""
    from evolution_spark.operators.graph import bfs_khops

    # 1 -> 2 -> 3 -> 4, plus shortcut 1 -> 3, and island 9 -> 10
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3), (9, 10)], "src long, dst long"
    )
    sources = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.hop for r in bfs_khops(edges, sources, 3).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2}  # 3 via shortcut, 4 via 3
    # hop budget cuts the frontier
    got2 = {r.node: r.hop for r in bfs_khops(edges, sources, 1).collect()}
    assert got2 == {1: 0, 2: 1, 3: 1}
    # directedness: nothing reaches the island; reverse edges not followed
    sources_b = spark.createDataFrame([(4,)], "node long")
    got3 = {r.node: r.hop for r in bfs_khops(edges, sources_b, 3).collect()}
    assert got3 == {4: 0}


def test_pagerank_symmetric_fastpath_matches_general_path(spark):
    """symmetric=True drops the per-iteration nodes-LEFT-JOIN-contrib
    reinstatement (identity on mirrored edge lists). The ranks must match
    the general path run on a pre-mirrored edge list (same algorithm,
    join retained) to float tolerance (sum reduction order is the only
    legitimate difference)."""
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "e"),
             ("e", "a"), ("b", "e"), ("f", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    fast = {r.id: r.rank for r in pagerank(df, symmetric=True, iters=4).collect()}
    mirrored = df.union(df.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst")))
    slow = {r.id: r.rank
            for r in pagerank(mirrored, symmetric=False, iters=4).collect()}
    assert set(fast) == set(slow)
    for n in fast:
        assert abs(fast[n] - slow[n]) < 1e-12, (n, fast[n], slow[n])
