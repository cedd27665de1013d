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
