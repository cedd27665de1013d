"""bench.py list reconciliation (round 13, VERDICT item 9): every
registered query must be in exactly one of BENCH_QUERIES / NOT_BENCHED,
so a new registration cannot silently miss the round's BENCH_FULL
snapshot (the r11/r12 late-line gap, closed structurally)."""


def test_every_query_is_benched_or_declared():
    import bench
    from evolution_spark.queries import QUERIES

    benched = set(bench.BENCH_QUERIES)
    declared = set(bench.NOT_BENCHED)
    assert not benched & declared, benched & declared
    # flf_mock_1m / flf_convert_1m are bench-only synthetic lines
    registered = set(QUERIES)
    unplaced = registered - benched - declared
    assert not unplaced, f"place in BENCH_QUERIES or NOT_BENCHED: {unplaced}"
    ghost = (benched | declared) - registered - {"flf_mock_1m",
                                                 "flf_convert_1m"}
    assert not ghost, f"listed but not registered: {ghost}"
