"""Property-based tests (hypothesis) for the composed operators whose edge
cases are hard to enumerate by hand: as-of join vs pandas merge_asof, SCD2
interval algebra, and sequence packing conservation.

Each property runs a bounded number of examples (Spark jobs are ~0.5 s
each); shrinking still produces minimal counterexamples on failure.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# changelog rows: (key, ts, seq, status) — seq unique per example via index
_changelogs = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),     # key
        st.integers(min_value=0, max_value=40),    # ts (collisions likely)
        st.sampled_from(["a", "b", "c"]),          # status
    ),
    min_size=1,
    max_size=25,
)


@given(rows=_changelogs)
@settings(**_SETTINGS)
def test_scd2_interval_algebra(spark, rows):
    """For ANY changelog: per key, intervals tile the timeline (each
    valid_to = next valid_from), exactly one open interval, consecutive
    intervals differ in attrs, and the first interval starts at the key's
    earliest event."""
    from evolution_spark.operators.temporal import scd2_from_changelog

    data = [(k, t, i, s) for i, (k, t, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "key int, ts int, seq int, status string")
    out = scd2_from_changelog(df, "key", "ts", ["status"], tiebreak="seq").collect()

    by_key: dict = {}
    for r in sorted(out, key=lambda r: (r.key, r.valid_from, r.valid_to is None)):
        by_key.setdefault(r.key, []).append(r)
    first_ts = {}
    for k, t, _i, _s in data:
        first_ts[k] = min(first_ts.get(k, t), t)
    for k, ivs in by_key.items():
        assert ivs[0].valid_from == first_ts[k]
        assert sum(1 for r in ivs if r.is_current) == 1
        assert ivs[-1].valid_to is None and ivs[-1].is_current
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from
            assert a.status != b.status or a.valid_to is None


_series = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=2),     # by key
        st.integers(min_value=0, max_value=50),    # on value
        st.integers(min_value=-5, max_value=5),    # payload
    ),
    min_size=1,
    max_size=20,
)


@given(left=_series, right=_series, direction=st.sampled_from(["backward", "forward"]))
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left, right, direction):
    """asof_join must agree with pandas.merge_asof for any inputs whose
    right side has unique (by, on) keys (pandas picks an arbitrary row on
    exact duplicates; ours picks a deterministic one — so dedupe first)."""
    from evolution_spark.operators.temporal import asof_join

    rdedup = {}
    for k, t, v in right:
        rdedup[(k, t)] = v
    right_rows = [(k, t, v) for (k, t), v in sorted(rdedup.items())]

    ldf = spark.createDataFrame(
        [(k, t, v) for k, t, v in left], "k int, t int, lv int"
    )
    rdf = spark.createDataFrame(right_rows, "k int, t int, rv int")
    got = (
        asof_join(ldf, rdf, on="t", by="k", direction=direction)
        .select("k", "t", "lv", "rv")
        .toPandas()
        .sort_values(["k", "t", "lv"], kind="mergesort")
        .reset_index(drop=True)
    )

    lp = pd.DataFrame(left, columns=["k", "t", "lv"]).sort_values("t", kind="mergesort")
    rp = pd.DataFrame(right_rows, columns=["k", "t", "rv"]).sort_values(
        "t", kind="mergesort"
    )
    want = (
        pd.merge_asof(lp, rp, on="t", by="k", direction=direction)
        .sort_values(["k", "t", "lv"], kind="mergesort")
        .reset_index(drop=True)
    )
    got_t = [tuple(None if pd.isna(x) else int(x) for x in row)
             for row in got.itertuples(index=False)]
    want_t = [tuple(None if pd.isna(x) else int(x) for x in row)
              for row in want.itertuples(index=False)]
    assert got_t == want_t


@given(
    tokens=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=30),
    budget=st.integers(min_value=1, max_value=400),
)
@settings(**_SETTINGS)
def test_pack_sequences_conservation(spark, tokens, budget):
    """Packing never loses or duplicates documents; pack ids are dense,
    start at 0, and are monotone in document order; each document's pack is
    exactly prefix_sum // budget."""
    from evolution_spark.operators.curation import pack_sequences

    rows = [("s", i, n) for i, n in enumerate(tokens)]
    df = spark.createDataFrame(rows, "shard string, seq int, n_tokens int")
    out = sorted(
        pack_sequences(df, "n_tokens", budget, by="shard", order="seq").collect(),
        key=lambda r: r.seq,
    )
    assert len(out) == len(tokens)
    prefix = 0
    prev_pack = 0
    for r in out:
        assert r.pack_id == prefix // budget
        assert r.pack_id >= prev_pack
        prev_pack = r.pack_id
        prefix += r.n_tokens


# ---------------------------------------------------------------------------
# Partition invariance: results must not depend on the cluster shape
# ---------------------------------------------------------------------------

_INVARIANCE_QUERIES = [
    # every family with engineered determinism risk: window tie-breaks,
    # greedy dedup, global rank, hash splits, as-of tie resolution, funnel
    "q1_pricing_summary",
    "window_row_number_latest",
    "topk_per_group",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "window_ntile_dist",
    "asof_join_orders",
    "scd2_user_status",
    "pack_sequences_budget",
    "funnel_conversion",
    "corpus_curation_pipeline",
    "equidepth_histogram",
    "kmeans_cluster_summary",
    # round-3 operators: winner election, sampling order, and shortlist
    # cuts must all be partition-count independent
    "dedup_repeated_chunks",
    "pq_encode_codes",
    "ivf_pq_rerank_topk",
    "source_quota_sample",
    "count_min_heavy_hitters",
    # round-5 operators: frontier BFS, rank-based cuts, and top-k paths
    # must be partition-count independent
    "bfs_khop_reach",
    "winsorize_event_values",
    "session_path_topk",
    "event_value_outliers",
    "cusum_changepoint_revenue",
    "ab_test_event_values",
    "data_contract_orders",
    "theil_sen_trend_revenue",
    "feature_hash_vectorize",
    "delta_skipping_scan",
    "iceberg_maintenance_lifecycle",
    "benford_digit_test",
    "lagged_crosscorr_orders",
]


@pytest.mark.parametrize("name", _INVARIANCE_QUERIES)
def test_result_is_partition_invariant(spark, sf_dir, name):
    """A 1000-executor cluster repartitions everything differently from
    local[8]; a query whose RESULT depends on spark.sql.shuffle.partitions
    is nondeterministic at scale. Run each engineered-determinism query
    under two very different partition counts and require identical rows."""
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, q(spark, sf_dir).collect()), key=repr)
        spark.conf.set("spark.sql.shuffle.partitions", "19")
        b = sorted(map(tuple, q(spark, sf_dir).collect()), key=repr)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


_docs = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]),  # tiny vocab -> chunk collisions
        min_size=1,
        max_size=12,
    ).map(" ".join),
    min_size=1,
    max_size=10,
)


@given(texts=_docs, k=st.integers(min_value=1, max_value=4))
@settings(**_SETTINGS)
def test_dedup_repeated_chunks_matches_reference(spark, texts, k):
    """For ANY corpus and chunk size: the operator equals the obvious
    sequential reference (walk docs in id order, keep a chunk iff its text
    was never seen before, rebuild)."""
    from evolution_spark.operators.dedup import dedup_repeated_chunks

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = {
        r.doc_id: r.dedup_text
        for r in dedup_repeated_chunks(df, "text", "doc_id", chunk_words=k).collect()
    }

    seen: set = set()
    want: dict = {}
    for i, t in enumerate(texts):
        words = t.split(" ")
        kept = []
        for s in range(0, len(words), k):
            chunk = " ".join(words[s : s + k])
            if chunk not in seen:
                seen.add(chunk)
                kept.append(chunk)
        if kept:
            want[i] = " ".join(kept)
    assert got == want


_vecs = st.lists(
    st.lists(
        st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
        min_size=8,
        max_size=8,
    ),
    min_size=2,
    max_size=12,
)


@given(vecs=_vecs)
@settings(**_SETTINGS)
def test_pq_encode_matches_reference(spark, vecs):
    """For ANY small corpus (dim 8, 2 subspaces of 4): PQ codes equal the
    reference argmin over the same deterministic hash-sampled codebook
    (quantization replicated with Spark's own round to dodge Python
    rounding differences)."""
    import hashlib

    from evolution_spark.operators.pq import pq_encode, pq_train

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )
    n_codes = min(4, len(vecs))
    cb = pq_train(df, "vec_id", "embedding", n_codes=n_codes)
    enc = pq_encode(df, cb, "vec_id", "embedding", n_subspaces=2).collect()
    got = {r["vec_id"]: (list(r["__vi"]), list(r["codes"])) for r in enc}

    # reference sample: n_codes smallest (md5-prefix, id); centroids = their
    # quantized vectors as Spark computed them (read back from `got`)
    order = sorted(
        (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16), i)
        for i in range(len(vecs))
    )
    cents = [got[i][0] for _h, i in order[:n_codes]]
    sub = 4
    for vid, (vi, codes) in got.items():
        for j in range(2):
            best = min(
                (
                    sum(
                        (vi[j * sub + d] - cents[c][j * sub + d]) ** 2
                        for d in range(sub)
                    ),
                    c,
                )
                for c in range(n_codes)
            )
            assert codes[j] == best[1], (vid, j, codes)
