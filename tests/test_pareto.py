"""Distributed 2-D skyline: brute-force equivalence, tie semantics, and
partition-count invariance (the boundary-carry path)."""

from __future__ import annotations

import random

from evolution_spark.operators.pareto import skyline_2d


def _brute(points):
    def dominated(p, o):
        return (o[0] <= p[0] and o[1] >= p[1]) and (o[0] < p[0] or o[1] > p[1])

    return sorted(
        p for p in points if not any(dominated(p, o) for o in points if o != p)
    )


def _run(spark, points, n_partitions):
    df = spark.createDataFrame(points, "x double, y long")
    out = skyline_2d(df, "x", "y", n_partitions=n_partitions)
    return sorted((r.x, r.y) for r in out.collect())


def test_skyline_simple_staircase(spark):
    pts = [(1.0, 1), (2.0, 5), (3.0, 3), (1.5, 5), (4.0, 6), (0.5, 0)]
    assert _run(spark, pts, 3) == _brute(pts)


def test_skyline_ties_and_duplicates(spark):
    # duplicates survive together; equal-x bigger-y dominates; equal-y
    # smaller-x dominates
    pts = [(1.0, 4), (1.0, 4), (1.0, 3), (2.0, 4), (0.5, 4), (2.0, 6)]
    got = _run(spark, pts, 4)
    assert got == _brute(pts)
    assert got.count((0.5, 4)) == 1 and (1.0, 4) not in got


def test_skyline_partition_invariance_random(spark):
    rng = random.Random(7)
    pts = [(round(rng.uniform(0, 10), 2), rng.randint(0, 50)) for _ in range(400)]
    expected = _brute(pts)
    for n in (1, 2, 7, 32):
        assert _run(spark, pts, n) == expected, f"n_partitions={n}"


def test_skyline_all_on_frontier(spark):
    # strictly increasing x and y: nothing dominates anything
    pts = [(float(i), i) for i in range(20)]
    assert _run(spark, pts, 5) == _brute(pts)


def test_skyline_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(1.0, 5), (None, 9), (2.0, None), (3.0, 6)], "x double, y long"
    )
    got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
    assert got == [(1.0, 5), (3.0, 6)]


def test_skyline_bigint_beyond_double_precision(spark):
    # 2^53 and 2^53+1 collide as doubles; native-type compare must keep both
    big = 1 << 53
    pts = [(1.0, big), (2.0, big + 1), (3.0, big)]
    df = spark.createDataFrame(pts, "x double, y long")
    got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y", n_partitions=2).collect())
    assert got == [(1.0, big), (2.0, big + 1)]
