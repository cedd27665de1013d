"""Probed-bounds oracles for the four rows-only queries (VERDICT r08 item
7): the driver can't hash-compare engine-specific sketch estimates or a
Spark-seeded random stream against DuckDB, but each has a PROBABLE
contract a local test can pin — estimate-vs-exact error bounds for the
sketches (the count-min pattern), distribution moments + determinism for
the seeded mock. A silent estimator break (wrong register merge, wrong
seed plumbing, wrong domain) fails here even though the driver row stays
rows-only.
"""

from pyspark.sql import functions as F

from evolution_spark.queries import QUERIES
from evolution_spark.queries.base import table


def test_approx_count_distinct_tracks_exact(spark, sf_dir):
    """HLL++ at rsd=0.01: both estimates within 5% of exact (≈5 standard
    errors — a register-indexing bug lands orders of magnitude off)."""
    got = QUERIES["agg_approx_count_distinct"](spark, sf_dir).first()
    l = table(spark, sf_dir, "lineitem")
    exact = l.agg(
        F.countDistinct("l_partkey").alias("parts"),
        F.countDistinct("l_orderkey").alias("orders"),
    ).first()
    assert abs(got.approx_parts - exact.parts) <= 0.05 * exact.parts
    assert abs(got.approx_orders - exact.orders) <= 0.05 * exact.orders


def test_approx_percentile_brackets_exact(spark, sf_dir):
    """approx_percentile at accuracy=10000: per-flag p50/p95 within 1% of
    the exact percentile, and the quantile ORDER holds."""
    got = {r.l_returnflag: r
           for r in QUERIES["approx_percentile_prices"](spark, sf_dir).collect()}
    exact = {r.l_returnflag: r for r in (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
             F.expr("percentile(l_extendedprice, 0.95)").alias("p95"))
        .collect()
    )}
    assert set(got) == set(exact)
    for flag, r in got.items():
        assert r.p50 <= r.p95
        assert abs(r.p50 - exact[flag].p50) <= 0.01 * exact[flag].p50
        assert abs(r.p95 - exact[flag].p95) <= 0.01 * exact[flag].p95


def test_hll_sketch_estimate_tracks_exact_and_merge_is_lossless(spark, sf_dir):
    """DataSketches HLL at lgConfigK=14: merged per-day estimate within 5%
    of the exact distinct count, and merging the daily sketches loses
    nothing vs sketching the whole column in one pass (same registers)."""
    got = QUERIES["hll_sketch_mergeable"](spark, sf_dir).first()
    e = table(spark, sf_dir, "events")
    exact = e.agg(F.countDistinct("user_id").alias("n")).first().n
    assert abs(got.distinct_users_est - exact) <= 0.05 * exact
    single = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 14)).alias("est")
    ).first().est
    # merge-consistency: union-of-parts == one-pass (HLL merge is exact
    # over registers, so the two estimates must agree to the integer)
    assert int(got.distinct_users_est) == int(single)
    assert got.n_events == e.count()


def test_flf_mock_moments_and_determinism(spark, sf_dir):
    """Seeded mock generation: pinned row count, Bernoulli(0.5) bool count
    within 6 sigma, Int32 range respected by the 11-rune field, near-unique
    names, and the seed makes the whole frame reproducible."""
    got = QUERIES["flf_mock_generate"](spark, sf_dir).first()
    assert got.n_rows == 1000
    # Binomial(1000, 0.5): sigma ≈ 15.8; 6 sigma ≈ 95
    assert 405 <= got.n_true <= 595
    assert -(2**31) <= got.min_i32 <= got.max_i32 <= 2**31 - 1
    # names draw uniformly from the ~100-entry first-name pool (the
    # reference mocker's en-US provider, mocker.py:35); 1000 draws cover
    # nearly the whole pool — a collapsed seed stream yields 1
    from evolution_spark.mocker import US_FIRST_NAMES

    pool = len([n for n in US_FIRST_NAMES if len(n) <= 12])
    assert 0.8 * pool <= got.n_names <= pool
    again = QUERIES["flf_mock_generate"](spark, sf_dir).first()
    assert again == got  # seed=7 pins the stream end to end
