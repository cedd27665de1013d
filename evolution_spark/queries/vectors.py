"""Embedding similarity search over the ``embeddings`` table
(``vec_id BIGINT, embedding ARRAY<FLOAT>[64], label INT``).

Dot products are computed as an explicit left-to-right double-precision fold
(``aggregate(zip_with(...))`` in Spark == ``list_inner_product(::DOUBLE[])``
in DuckDB) so both engines produce bit-comparable sums; similarities are
rounded before ranking and ids break ties, keeping top-k deterministic.

Scale design (billions of vectors):
* Brute-force top-k is the baseline for a bounded probe set: probes broadcast
  against the full corpus — cost O(probes x corpus), one scan, no shuffle of
  the corpus.
* The scale path is LSH bucketing (random-hyperplane signs): each vector maps
  to a bucket key; neighbor search touches only its bucket. Hyperplanes are
  deterministic +/-1 patterns derived from md5 parity so the oracle can
  replicate them.
* Centroid/norm analytics: posexplode -> groupBy(component) — a shuffle of
  n_vectors x 64 scalar rows, embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from evolution_spark.queries.base import query, query_tmp, table

N_PROBES = 10
TOP_K = 5
N_PLANES = 8
DIM = 64


def dot(a: str | Column, b: str | Column) -> Column:
    """Sequential double-precision dot product (order-stable across engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: str | Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


_DOT_SQL = "list_inner_product({a}::DOUBLE[], {b}::DOUBLE[])"


def _cos_sql(a: str, b: str) -> str:
    d = _DOT_SQL.format(a=a, b=b)
    na = f"sqrt({_DOT_SQL.format(a=a, b=a)})"
    nb = f"sqrt({_DOT_SQL.format(a=b, b=b)})"
    return f"({d} / ({na} * {nb}))"


@query(
    "vector_norms",
    oracle=f"""
    SELECT label, COUNT(*) AS n_vectors,
           ROUND(AVG(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4) AS avg_norm,
           ROUND(MIN(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4) AS min_norm,
           ROUND(MAX(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4) AS max_norm
    FROM embeddings GROUP BY label
    """,
)
def vector_norms(spark, sf_dir):
    """L2-norm statistics per label — one narrow projection + small-key agg."""
    e = table(spark, sf_dir, "embeddings")
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg(norm("embedding")), 4).alias("avg_norm"),
        F.round(F.min(norm("embedding")), 4).alias("min_norm"),
        F.round(F.max(norm("embedding")), 4).alias("max_norm"),
    )


@query(
    "knn_bruteforce_cosine",
    oracle=f"""
    WITH probes AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
                    WHERE vec_id < {N_PROBES}),
         scored AS (
      SELECT p.probe_id, e.vec_id AS neighbor_id,
             ROUND({_cos_sql('p.pe', 'e.embedding')}, 6) AS cos_sim
      FROM probes p CROSS JOIN embeddings e
      WHERE e.vec_id != p.probe_id
    )
    SELECT probe_id, neighbor_id, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored) WHERE rn <= {TOP_K}
    """,
)
def knn_bruteforce_cosine(spark, sf_dir):
    """Brute-force cosine top-k for a probe set: probes broadcast against the
    corpus scan (no corpus shuffle); ranking rounds similarity to 6 dp and
    tie-breaks on id for cross-engine determinism."""
    e = table(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe")
    )
    scored = (
        e.crossJoin(F.broadcast(probes))
        .where(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine("pe", "embedding"), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("probe_id", "neighbor_id", "cos_sim")
    )


def _plane_sign_sql(j: int, c: str) -> str:
    # deterministic pseudo-random +/-1: parity of a hash of (plane j, dim c)
    return f"(CASE WHEN (('0x'||substr(md5('{j}:'|| {c}),1,8))::BIGINT % 2) = 0 THEN 1.0 ELSE -1.0 END)"


def _bucket_expr() -> Column:
    """LSH bucket key via the shared library (functions/vectors.lsh_bucket):
    hyperplane +/-1 components are md5-parity constants precomputed
    driver-side — the oracle recomputes the identical values in SQL."""
    from evolution_spark.functions.vectors import lsh_bucket

    return lsh_bucket(F.col("embedding"), N_PLANES, DIM)


def _bucket_sql() -> str:
    parts = []
    for j in range(N_PLANES):
        proj = (
            "list_sum(list_transform(range(64), i -> "
            f"embedding[i+1]::DOUBLE * {_plane_sign_sql(j, 'i')}))"
        )
        parts.append(f"(CASE WHEN {proj} >= 0 THEN '1' ELSE '0' END)")
    return " || ".join(parts)


@query(
    "ann_lsh_buckets",
    oracle=f"""
    SELECT {_bucket_sql()} AS bucket, COUNT(*) AS n_vectors
    FROM embeddings GROUP BY 1
    """,
)
def ann_lsh_buckets(spark, sf_dir):
    """Random-hyperplane LSH bucket histogram — the partitioning layer of the
    scale-path ANN (each query then searches ~corpus/2^planes vectors). The
    hyperplanes are deterministic md5-parity +/-1 vectors, identical in the
    oracle."""
    e = table(spark, sf_dir, "embeddings")
    return e.groupBy(_bucket_expr().alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_vectors")
    )


@query(
    "ann_lsh_topk",
    oracle=f"""
    WITH bucketed AS (
      SELECT vec_id, embedding, {_bucket_sql()} AS bucket FROM embeddings
    ), probes AS (
      SELECT vec_id AS probe_id, embedding AS pe, bucket FROM bucketed
      WHERE vec_id < {N_PROBES}
    ), scored AS (
      SELECT p.probe_id, e.vec_id AS neighbor_id,
             ROUND({_cos_sql('p.pe', 'e.embedding')}, 6) AS cos_sim
      FROM probes p JOIN bucketed e ON p.bucket = e.bucket
      WHERE e.vec_id != p.probe_id
    )
    SELECT probe_id, neighbor_id, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored) WHERE rn <= {TOP_K}
    """,
)
def ann_lsh_topk(spark, sf_dir):
    """Approximate top-k: probes search only their own LSH bucket — the join
    is on the bucket key, so at a billion vectors each task touches one
    bucket's worth of candidates instead of the corpus."""
    e = table(spark, sf_dir, "embeddings")
    bucketed = e.select("vec_id", "embedding", _bucket_expr().alias("bucket"))
    probes = bucketed.where(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pe"),
        "bucket",
    )
    scored = (
        bucketed.join(F.broadcast(probes), "bucket")
        .where(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine("pe", "embedding"), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("probe_id", "neighbor_id", "cos_sim")
    )


@query(
    "embedding_centroid_distance",
    oracle="""
    WITH comps AS (
      SELECT label, vec_id, i.i AS pos,
             CAST(floor(embedding[i.i + 1]::DOUBLE * 1000000) AS BIGINT) AS vq
      FROM embeddings, (SELECT unnest(range(64)) AS i) i
    ), centroids AS (
      SELECT label, pos, SUM(vq) AS s, COUNT(*) AS n FROM comps GROUP BY label, pos
    )
    SELECT comps.vec_id, comps.label,
           ROUND(sqrt(SUM((comps.vq - centroids.s * 1.0 / centroids.n)
                          * (comps.vq - centroids.s * 1.0 / centroids.n))) / 1000000.0, 4) AS dist_to_centroid
    FROM comps JOIN centroids ON comps.label = centroids.label AND comps.pos = centroids.pos
    GROUP BY comps.vec_id, comps.label
    """,
)
def embedding_centroid_distance(spark, sf_dir):
    """Distance of each vector to its label centroid: posexplode ->
    per-(label, component) mean -> rejoin -> per-vector reduce. Two shuffles
    of scalar rows; no vector is ever held whole on the agg path."""
    e = table(spark, sf_dir, "embeddings")
    # Components are floor-quantized to 1e-6 ints so the centroid mean is a
    # ratio of exact integers — identical across engines regardless of
    # aggregation order (a raw double AVG is order-sensitive in the last ulp).
    comps = e.select(
        "label", "vec_id", F.posexplode("embedding").alias("pos", "v_raw")
    ).select(
        "label", "vec_id", "pos",
        F.floor(F.col("v_raw").cast("double") * 1000000).cast("bigint").alias("vq"),
    )
    centroids = comps.groupBy("label", "pos").agg(
        F.sum("vq").alias("s"), F.count(F.lit(1)).alias("n")
    )
    diff = F.col("vq") - F.col("s") * 1.0 / F.col("n")
    return (
        comps.join(centroids, ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(F.round(F.sqrt(F.sum(diff * diff)) / 1000000.0, 4).alias("dist_to_centroid"))
    )


# ---------------------------------------------------------------------------
# Product quantization (operators/pq.py)
# ---------------------------------------------------------------------------

PQ_CODES = 16
PQ_SUBSPACES = 8
PQ_SCALE = 1000

_PQ_V_SQL = """
    v AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(ROUND(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS vi
      FROM embeddings
    ), s AS (
      SELECT ROW_NUMBER() OVER (
               ORDER BY ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,8))::BIGINT,
                        vec_id) - 1 AS code,
             vi
      FROM v
      ORDER BY ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,8))::BIGINT, vec_id
      LIMIT 16
    ), d AS (
      SELECT v.vec_id, j.j AS subspace, s.code,
             list_sum(list_transform(range(8),
                      i -> (v.vi[j.j*8+i+1]-s.vi[j.j*8+i+1])
                         * (v.vi[j.j*8+i+1]-s.vi[j.j*8+i+1]))) AS d2
      FROM v CROSS JOIN (SELECT unnest(range(8)) AS j) j CROSS JOIN s
    ), a AS (
      SELECT vec_id, subspace, code FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
                                     ORDER BY d2, code) AS rk FROM d)
      WHERE rk = 1
    )
""".strip()


@query(
    "pq_encode_codes",
    oracle=f"""
    WITH {_PQ_V_SQL}
    SELECT vec_id,
           string_agg(CAST(code AS VARCHAR), ',' ORDER BY subspace) AS codes
    FROM a GROUP BY vec_id
    """,
)
def pq_encode_codes(spark, sf_dir):
    """Product-quantization encoding: each 64-dim vector compresses to 8
    subspace codes against a 16-entry deterministic codebook (hash-sampled
    training vectors, integer grid). The codebook broadcasts as one packed
    row; encoding is a per-row argmin inside codegen — zero corpus shuffle.
    Codes render as a comma string (engine-neutral array form)."""
    from evolution_spark.operators.pq import pq_encode, pq_train

    e = table(spark, sf_dir, "embeddings")
    cb = pq_train(e, "vec_id", "embedding", n_codes=PQ_CODES, scale=PQ_SCALE)
    enc = pq_encode(e, cb, "vec_id", "embedding",
                    n_subspaces=PQ_SUBSPACES, scale=PQ_SCALE)
    return enc.select(
        "vec_id",
        F.array_join(F.transform("codes", lambda c: c.cast("string")), ",").alias("codes"),
    )


@query(
    "pq_adc_topk",
    oracle=f"""
    WITH {_PQ_V_SQL},
    p AS (SELECT vi FROM v WHERE vec_id = 0),
    t AS (
      SELECT j.j AS subspace, s.code,
             list_sum(list_transform(range(8),
                      i -> (p.vi[j.j*8+i+1]-s.vi[j.j*8+i+1])
                         * (p.vi[j.j*8+i+1]-s.vi[j.j*8+i+1]))) AS pd2
      FROM p CROSS JOIN (SELECT unnest(range(8)) AS j) j CROSS JOIN s
    )
    SELECT a.vec_id, CAST(SUM(t.pd2) AS BIGINT) AS adc_score
    FROM a JOIN t ON a.subspace = t.subspace AND a.code = t.code
    GROUP BY a.vec_id
    ORDER BY adc_score, vec_id LIMIT 10
    """,
)
def pq_adc_topk(spark, sf_dir):
    """Asymmetric-distance top-10 for probe vec_id=0 over PQ codes: the
    m x k partial-distance table is built once from the collected (tiny,
    deterministic) codebook and probe, shipped as a literal, and each row
    reduces its 8 codes against it — corpus scanned once, never shuffled,
    top-k via TakeOrderedAndProject. Exact integer arithmetic end to end,
    so the oracle's join formulation is bit-identical."""
    from evolution_spark.operators.pq import pq_adc_topk as adc

    enc, cb_rows, probe_vi, _cell_of, _best = _ivf_pq_setup(spark, sf_dir)
    return adc(enc, cb_rows, probe_vi, "vec_id",
               n_subspaces=PQ_SUBSPACES, topk=10)


_IVF_PQ_TOPK_ORACLE = f"""
    WITH {_PQ_V_SQL},
    cells AS (
      SELECT ROW_NUMBER() OVER (
               ORDER BY ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,8))::BIGINT,
                        vec_id) AS cell_id,
             vi AS cen
      FROM v
      ORDER BY ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,8))::BIGINT, vec_id
      LIMIT 8
    ), ad AS (
      SELECT v.vec_id, c.cell_id,
             list_sum(list_transform(range(64),
                      i -> (v.vi[i+1]-c.cen[i+1])*(v.vi[i+1]-c.cen[i+1]))) AS cd2
      FROM v CROSS JOIN cells c
    ), asg AS (
      SELECT vec_id, cell_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY cd2, cell_id) AS rn FROM ad)
      WHERE rn = 1
    ), pcells AS (
      SELECT cell_id FROM ad WHERE vec_id = 0 ORDER BY cd2, cell_id LIMIT 2
    ), p AS (SELECT vi FROM v WHERE vec_id = 0),
    t AS (
      SELECT j.j AS subspace, s.code,
             list_sum(list_transform(range(8),
                      i -> (p.vi[j.j*8+i+1]-s.vi[j.j*8+i+1])
                         * (p.vi[j.j*8+i+1]-s.vi[j.j*8+i+1]))) AS pd2
      FROM p CROSS JOIN (SELECT unnest(range(8)) AS j) j CROSS JOIN s
    )
    SELECT a.vec_id, CAST(SUM(t.pd2) AS BIGINT) AS adc_score
    FROM a
    JOIN t ON a.subspace = t.subspace AND a.code = t.code
    JOIN asg ON asg.vec_id = a.vec_id
    WHERE asg.cell_id IN (SELECT cell_id FROM pcells)
    GROUP BY a.vec_id
    ORDER BY adc_score, a.vec_id LIMIT 10
    """


@query("ivf_pq_topk", oracle=_IVF_PQ_TOPK_ORACLE)
def ivf_pq_topk(spark, sf_dir):
    """IVF-PQ search, the billion-scale ANN recipe end to end: 8 IVF cells
    prune the corpus to the probe's 2 nearest cells, PQ codes + an ADC
    lookup table score the survivors — ONE narrow corpus scan (per-row
    cell argmin against 8 literal centroids -> cell filter -> 8 table
    lookups), zero shuffle, top-k via TakeOrderedAndProject. At real scale
    the corpus would be written partitioned by cell_id, turning the cell
    filter into partition pruning so non-probed cells are never read."""
    from evolution_spark.operators.pq import pq_adc_topk

    enc, cb_rows, probe_vi, pruned = _ivf_pq_pruned(spark, sf_dir)
    return pq_adc_topk(pruned, cb_rows, probe_vi, "vec_id",
                       n_subspaces=PQ_SUBSPACES, topk=10)


def _ivf_pq_pruned(spark, sf_dir):
    """Shared IVF-PQ setup: encoded corpus, collected codebook, quantized
    probe (vec 0), and the corpus pruned to the probe's 2 nearest of 8
    cells — one narrow scan, all constants literal."""
    enc, cb_rows, probe_vi, cell_of, best_cells = _ivf_pq_setup(spark, sf_dir)
    return enc, cb_rows, probe_vi, enc.where(cell_of.isin(best_cells))


def _ivf_pq_setup(spark, sf_dir):
    """Shared IVF-PQ pieces: encoded corpus, collected codebook, quantized
    probe (vec 0), the per-row cell-argmin expression, and the probe's 2
    nearest of 8 cell ids (picked on the driver with exact integer math)."""
    from evolution_spark.operators.pq import _d2, _quantized, pq_encode, pq_train

    e = table(spark, sf_dir, "embeddings")
    cb = pq_train(e, "vec_id", "embedding", n_codes=PQ_CODES, scale=PQ_SCALE)
    # two tiny driver actions (measured faster warm than fusing them via a
    # 1-row crossJoin, whose joined plan defeats the TakeOrdered fast path)
    cb_rows = [(r["code"], list(r["cen"])) for r in cb.first()["__pq"]]
    probe_vi = list(
        e.where(F.col("vec_id") == 0)
        .select(_quantized("embedding", PQ_SCALE).alias("__probe_vi"))
        .first()["__probe_vi"]
    )
    # re-emit the collected codebook as a literal one-row frame: the main
    # job then encodes against constants instead of re-running the
    # sampling scan (one fewer corpus pass per action)
    cb_lit = spark.createDataFrame(
        [(cb_rows,)], "__pq array<struct<code:int,cen:array<bigint>>>"
    )
    enc = pq_encode(e, cb_lit, "vec_id", "embedding",
                    n_subspaces=PQ_SUBSPACES, scale=PQ_SCALE)

    # IVF cells: the 8 smallest-hash training vectors double as cell
    # centroids (ranks 0-7 of the same deterministic sample); probe cells
    # are picked on the driver with exact integer arithmetic.
    cells = [(code + 1, cen) for code, cen in sorted(cb_rows)[:8]]
    d2_int = lambda a, b: sum((x - y) * (x - y) for x, y in zip(a, b))
    probed = sorted((d2_int(probe_vi, cen), cid) for cid, cen in cells)
    best_cells = [cid for _d, cid in probed[:2]]

    from evolution_spark.functions.vectors import lit_long_array as lit_vec
    cell_of = F.array_min(
        F.array(
            *[
                F.struct(
                    _d2(F.col("__vi"), lit_vec(cen)).alias("dist"),
                    F.lit(cid).cast("int").alias("cell_id"),
                )
                for cid, cen in cells
            ]
        )
    )["cell_id"]
    return enc, cb_rows, probe_vi, cell_of, best_cells


@query(
    "ivf_pq_rerank_topk",
    oracle=f"""
    WITH {_PQ_V_SQL},
    cells AS (
      SELECT ROW_NUMBER() OVER (
               ORDER BY ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,8))::BIGINT,
                        vec_id) AS cell_id,
             vi AS cen
      FROM v
      ORDER BY ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,8))::BIGINT, vec_id
      LIMIT 8
    ), ad AS (
      SELECT v.vec_id, c.cell_id,
             list_sum(list_transform(range(64),
                      i -> (v.vi[i+1]-c.cen[i+1])*(v.vi[i+1]-c.cen[i+1]))) AS cd2
      FROM v CROSS JOIN cells c
    ), asg AS (
      SELECT vec_id, cell_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY cd2, cell_id) AS rn FROM ad)
      WHERE rn = 1
    ), pcells AS (
      SELECT cell_id FROM ad WHERE vec_id = 0 ORDER BY cd2, cell_id LIMIT 2
    ), p AS (SELECT vi FROM v WHERE vec_id = 0),
    t AS (
      SELECT j.j AS subspace, s.code,
             list_sum(list_transform(range(8),
                      i -> (p.vi[j.j*8+i+1]-s.vi[j.j*8+i+1])
                         * (p.vi[j.j*8+i+1]-s.vi[j.j*8+i+1]))) AS pd2
      FROM p CROSS JOIN (SELECT unnest(range(8)) AS j) j CROSS JOIN s
    ), shortlist AS (
      SELECT a.vec_id
      FROM a
      JOIN t ON a.subspace = t.subspace AND a.code = t.code
      JOIN asg ON asg.vec_id = a.vec_id
      WHERE asg.cell_id IN (SELECT cell_id FROM pcells)
      GROUP BY a.vec_id
      ORDER BY CAST(SUM(t.pd2) AS BIGINT), a.vec_id LIMIT 50
    )
    SELECT v.vec_id,
           CAST(list_sum(list_transform(range(64),
                i -> (v.vi[i+1]-p.vi[i+1])*(v.vi[i+1]-p.vi[i+1]))) AS BIGINT) AS d2
    FROM shortlist sl JOIN v ON v.vec_id = sl.vec_id CROSS JOIN p
    ORDER BY d2, v.vec_id LIMIT 10
    """,
)
def ivf_pq_rerank_topk(spark, sf_dir):
    """IVF-PQ with exact reranking — the full production recipe: the ADC
    pass shortlists 50 candidates from the probe's cells (compressed-domain
    scan, cheap), then the shortlist ALONE is rescored with exact integer
    L2 against the probe and re-cut to top-10. The expensive exact math
    touches 50 rows instead of the corpus; the shortlist re-enters by
    broadcast semi-join, so the corpus still shuffles nowhere."""
    from evolution_spark.operators.pq import _d2, pq_adc_topk

    enc, cb_rows, probe_vi, pruned = _ivf_pq_pruned(spark, sf_dir)
    shortlist = pq_adc_topk(pruned, cb_rows, probe_vi, "vec_id",
                            n_subspaces=PQ_SUBSPACES, topk=50).select("vec_id")
    from evolution_spark.functions.vectors import lit_long_array

    probe_lit = lit_long_array(probe_vi)
    exact = (
        enc.join(F.broadcast(shortlist), "vec_id", "left_semi")
        .select("vec_id", _d2(F.col("__vi"), probe_lit).alias("d2"))
    )
    return exact.orderBy("d2", "vec_id").limit(10)


@query("ivf_pq_topk_partitioned", oracle=_IVF_PQ_TOPK_ORACLE)
def ivf_pq_topk_partitioned(spark, sf_dir):
    """IVF-PQ search over the PRODUCTION layout: the encoded corpus is
    written hive-partitioned by cell_id (``io/ivf_layout.py``), and the
    probe reads back only its 2 nearest cells — the cell predicate becomes
    ``PartitionFilters`` on the scan, so at a billion vectors the 6
    non-probed cells are never read at all (I/O ~ nprobe/n_cells of the
    corpus, vs ``ivf_pq_topk``'s full-scan-with-filter). Same ADC scoring,
    same oracle: the layout is a lossless rewrite.

    Plan gate: tests/test_plans.py::test_ivf_partitioned_scan_prunes_cells.
    """
    from evolution_spark.io.ivf_layout import read_ivf_cells, write_ivf_partitioned
    from evolution_spark.operators.pq import pq_adc_topk

    enc, cb_rows, probe_vi, cell_of, best_cells = _ivf_pq_setup(spark, sf_dir)
    tmp = query_tmp("ivfpart", sf_dir)
    write_ivf_partitioned(
        enc.withColumn("cell_id", cell_of), tmp, sort_col="vec_id"
    )
    back = read_ivf_cells(spark, tmp, best_cells)
    return pq_adc_topk(back, cb_rows, probe_vi, "vec_id",
                       n_subspaces=PQ_SUBSPACES, topk=10)
