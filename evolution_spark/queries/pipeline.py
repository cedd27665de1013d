"""Training-data pipeline operations over ``documents`` and ``embeddings``:
deterministic dataset splitting, stratified sampling, entity scrubbing,
length bucketing, int8 embedding quantization, and random-projection
dimensionality reduction.

These are the dataset-curation steps of a large-scale LLM data pipeline
(alongside the dedup family in queries/text.py and similarity search in
queries/vectors.py). Every operator is deterministic — splits and samples
assign membership by content hash, not RNG — so each has a bit-exact DuckDB
oracle, and re-running a 100 TB pipeline reproduces the same datasets.

All expressions are Spark built-ins (no UDFs): hashing via md5-prefix ints
(functions/text.hash32), vector math via explicit double folds
(functions/vectors), so everything stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from evolution_spark.functions.text import hash32
from evolution_spark.functions.vectors import plane_sign_value
from evolution_spark.queries.base import query, table

_HASH_SQL = "('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT"
_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

TRAIN_PCT = 90  # train/test split: hash mod 100 < 90 -> train
SAMPLE_PER_MILLE = 100  # stratified sample: hash mod 1000 < 100 -> 10%
DIM = 64
REDUCED_DIM = 8


@query(
    "train_test_split_hash",
    oracle=f"""
    SELECT CASE WHEN {_HASH_SQL} % 100 < {TRAIN_PCT} THEN 'train' ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) * 1.0 / COUNT(*) AS avg_chars
    FROM documents
    GROUP BY 1
    """,
)
def train_test_split_hash(spark, sf_dir):
    """Deterministic train/test split by content-id hash (md5 mod 100):
    membership is a pure function of doc_id, so the split is stable across
    runs, machines, and engine versions — no RNG, no sampled() nondeterminism.
    At 100 TB this is a narrow projection (no shuffle) followed by a 2-key
    aggregation."""
    d = table(spark, sf_dir, "documents")
    split = F.when(
        hash32(F.col("doc_id").cast("string")) % 100 < TRAIN_PCT, "train"
    ).otherwise("test")
    return d.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("n_chars") * 1.0 / F.count(F.lit(1))).alias("avg_chars"),
    )


@query(
    "stratified_sample_hash",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_HASH_SQL} % 1000 < {SAMPLE_PER_MILLE}
    """,
)
def stratified_sample_hash(spark, sf_dir):
    """Deterministic ~10% sample via hash threshold (hash mod 1000 < 100).
    Unlike ``df.sample()`` this is reproducible and join-stable: the same
    doc_id is always in or out, so downstream tables sampled with the same
    key stay referentially consistent. Per-stratum rates just vary the
    threshold by stratum (the hash is uniform within every lang/source
    stratum by construction)."""
    d = table(spark, sf_dir, "documents")
    return d.where(
        hash32(F.col("doc_id").cast("string")) % 1000 < SAMPLE_PER_MILLE
    ).select("doc_id", "lang", "source")


SOURCE_QUOTA = 50


@query(
    "source_quota_sample",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY {_HASH_SQL}, doc_id) AS rk
      FROM documents
    )
    SELECT source, COUNT(*) AS n_kept, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM ranked WHERE rk <= {SOURCE_QUOTA}
    GROUP BY source
    """,
)
def source_quota_sample(spark, sf_dir):
    """Per-source document quota: keep at most N docs per source, chosen by
    content-id hash order (deterministic, engine-stable — no RNG) — the
    domain-balancing pass of a web-scale corpus (no single crawl host may
    dominate the training mix). One window over a shuffle by source; the
    hash ordering means the kept set is a stable function of the corpus,
    so re-runs and incremental extensions agree on what was kept. A hot
    source at 100 TB sorts only its own partition; for pathological
    single-source skew, pre-filter with an approximate per-source count
    and hash threshold before the exact window."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        hash32(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.select("doc_id", "source", F.row_number().over(w).alias("rk"))
    return (
        ranked.where(F.col("rk") <= SOURCE_QUOTA)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


_ENT_PAT = r"\b(customer|spark)\b"


@query(
    "entity_scrub_redact",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_ENT_PAT}')) AS n_redacted,
           length(regexp_replace(text, '{_ENT_PAT}', '[ENT]', 'g')) AS scrubbed_len
    FROM documents
    WHERE len(regexp_extract_all(text, '{_ENT_PAT}')) > 0
    """,
)
def entity_scrub_redact(spark, sf_dir):
    """Pattern scrubbing (the PII-redaction shape): regexp-replace a term
    lexicon with a placeholder token, reporting per-doc redaction counts.
    The synthetic corpus has no real PII, so the lexicon here is a
    two-word stand-in; a production pipeline swaps in email/phone/SSN
    patterns — the dataflow (scan -> regexp count/replace -> filter) is
    identical and fully pushed into codegen."""
    d = table(spark, sf_dir, "documents")
    n_red = F.size(F.regexp_extract_all("text", F.lit(_ENT_PAT), 0))
    scrubbed = F.regexp_replace("text", _ENT_PAT, "[ENT]")
    return (
        d.select(
            "doc_id",
            n_red.alias("n_redacted"),
            F.length(scrubbed).alias("scrubbed_len"),
        )
        .where(F.col("n_redacted") > 0)
    )


@query(
    "doc_length_histogram",
    oracle=f"""
    SELECT LEAST(len(string_split({_NORM_SQL}, ' ')) // 20, 9) AS bucket,
           COUNT(*) AS n_docs,
           MIN(len(string_split({_NORM_SQL}, ' '))) AS min_tokens,
           MAX(len(string_split({_NORM_SQL}, ' '))) AS max_tokens
    FROM documents
    GROUP BY 1
    """,
)
def doc_length_histogram(spark, sf_dir):
    """Token-length histogram (capped width-20 buckets) — the
    length-distribution audit every curation pipeline runs before filtering.
    One narrow projection, one tiny-key aggregation."""
    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
    )
    bucket = F.least(F.floor(n_tokens / 20), F.lit(9)).cast("bigint")
    return (
        d.select(n_tokens.alias("nt"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("nt").alias("min_tokens"),
            F.max("nt").alias("max_tokens"),
        )
    )


@query(
    "embedding_quantize_int8",
    oracle="""
    WITH scaled AS (
      SELECT vec_id,
             list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0 AS scale
      FROM embeddings
    )
    SELECT e.vec_id,
           ROUND(s.scale, 9) AS scale,
           CAST(ROUND(e.embedding[1]::DOUBLE / s.scale) AS INT) AS q_first,
           CAST(ROUND(e.embedding[64]::DOUBLE / s.scale) AS INT) AS q_last,
           ROUND(list_max(list_transform(embedding,
                 x -> abs(x::DOUBLE - ROUND(x::DOUBLE / s.scale) * s.scale))), 9) AS max_abs_err
    FROM embeddings e JOIN scaled s USING (vec_id)
    """,
)
def embedding_quantize_int8(spark, sf_dir):
    """Symmetric int8 quantization of embeddings (per-vector absmax scale,
    q = round(v/scale) in [-127, 127]) with the max reconstruction error —
    the storage-compression step before ANN indexing (4x smaller than f32).
    Pure array expressions per row: no shuffle, no UDF; at 100 TB this is
    scan-bound."""
    e = table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    scale = (
        F.array_max(F.transform("embedding", lambda x: F.abs(xd(x)))) / 127.0
    )
    # The raw scale keeps an internal name: aliasing the ROUNDED value as
    # "scale" in the same select would capture the q/err expressions via
    # lateral column alias resolution (they must quantize with full
    # precision, exactly as the oracle's CTE does).
    raw = F.col("_scale_raw")
    q = lambda v: F.round(xd(v) / raw).cast("int")  # noqa: E731
    err = F.array_max(
        F.transform(
            "embedding",
            lambda x: F.abs(xd(x) - F.round(xd(x) / raw) * raw),
        )
    )
    return (
        e.withColumn("_scale_raw", scale)
        .select(
            "vec_id",
            F.round("_scale_raw", 9).alias("scale"),
            q(F.element_at("embedding", 1)).alias("q_first"),
            q(F.element_at("embedding", DIM)).alias("q_last"),
            F.round(err, 9).alias("max_abs_err"),
        )
    )


def _proj_sql(j: int) -> str:
    # Mirror of the Spark literal sign arrays: same md5-parity constants.
    terms = "+".join(
        f"embedding[{i + 1}]::DOUBLE * ({plane_sign_value(j, i)})" for i in range(DIM)
    )
    return f"ROUND({terms}, 6)"


@query(
    "random_projection_reduce",
    oracle=f"""
    SELECT vec_id, {", ".join(f"{_proj_sql(j)} AS p{j}" for j in range(REDUCED_DIM))}
    FROM embeddings WHERE vec_id < 50
    """,
)
def random_projection_reduce(spark, sf_dir):
    """Random-projection dimensionality reduction 64 -> 8 (Johnson-
    Lindenstrauss style): each output component is a dot product with a
    deterministic +/-1 sign vector (md5-parity constants, the same family
    the LSH bucketing uses — functions/vectors.plane_sign_value). Signs are
    literal arrays, so each row is 8x64 multiply-adds in codegen; the
    left-to-right double fold makes the sums bit-identical to the oracle's
    explicit term chain."""
    from evolution_spark.functions.vectors import lit_double_array

    e = table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 50)
    cols = []
    for j in range(REDUCED_DIM):
        signs = lit_double_array(plane_sign_value(j, i) for i in range(DIM))
        proj = F.aggregate(
            F.zip_with("embedding", signs, lambda x, s: x.cast("double") * s),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        cols.append(F.round(proj, 6).alias(f"p{j}"))
    return e.select("vec_id", *cols)


CHUNK_TOKENS = 32
CHUNK_OVERLAP = 8
_STEP = CHUNK_TOKENS - CHUNK_OVERLAP


@query(
    "chunk_documents_overlap",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents
    ), ex AS (
      SELECT doc_id, w, unnest(range(((len(w) - 1) // {_STEP}) + 1)) AS chunk_idx
      FROM tok
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           len(w[chunk_idx * {_STEP} + 1 : chunk_idx * {_STEP} + {CHUNK_TOKENS}]) AS n_tokens,
           md5(array_to_string(w[chunk_idx * {_STEP} + 1 : chunk_idx * {_STEP} + {CHUNK_TOKENS}], ' ')) AS chunk_hash
    FROM ex
    """,
)
def chunk_documents_overlap(spark, sf_dir):
    """Token-window chunking with overlap (32-token windows, 8-token
    overlap) — the chunking step of a RAG / pretraining-data pipeline. Pure
    array expressions: split once, explode a start-index sequence, slice per
    chunk; one Generate (explode), no shuffle, no UDF. Emits a content hash
    per chunk (chunk texts stay out of the result for compact comparison).
    At 100 TB this is scan-bound and embarrassingly parallel."""
    d = table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
    tok = d.select("doc_id", w.alias("w"))
    ex = tok.select(
        "doc_id", "w",
        F.explode(F.sequence(F.lit(0), F.floor((F.size("w") - 1) / _STEP).cast("int"))).alias("chunk_idx"),
    )
    chunk = F.slice("w", F.col("chunk_idx") * _STEP + 1, CHUNK_TOKENS)
    return ex.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


MIX_ALPHA_BUDGET = 300  # total docs the temperature mix samples


@query(
    "temperature_mix_sample",
    oracle=f"""
    WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    w AS (SELECT lang, n, sqrt(n::DOUBLE) AS wt FROM c),
    t AS (SELECT SUM(wt) AS tw FROM w),
    q AS (SELECT lang, n, CAST(ROUND(wt / t.tw * {MIX_ALPHA_BUDGET}) AS BIGINT)
                 AS quota
          FROM w CROSS JOIN t),
    ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY {_HASH_SQL}, doc_id) AS rk
      FROM documents
    )
    SELECT r.lang, q.n AS n_total, q.quota,
           COUNT(*) AS n_kept, MIN(r.doc_id) AS min_doc
    FROM ranked r JOIN q USING (lang) WHERE r.rk <= q.quota
    GROUP BY r.lang, q.n, q.quota
    """,
)
def temperature_mix_sample(spark, sf_dir):
    """Temperature-scaled language mixing (the mT5/Pile recipe): sampling
    quota per language ~ n^alpha (alpha=0.5 here — sqrt flattening), so
    low-resource languages are upsampled relative to their share and the
    head language stops dominating the training mix. Quotas derive
    IN-PLAN from the per-lang counts (a vocabulary-sized aggregate +
    broadcast total — no driver round-trip); the kept set is hash-ranked
    per language, so re-runs and incremental corpus extensions agree on
    what was sampled. One shuffle by lang for the ranking window plus one
    tiny quota broadcast; a hot language at 100 TB sorts only its own
    partition (pre-filter with a hash threshold for pathological
    single-lang skew, as source_quota_sample documents)."""
    d = table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    w = c.select("lang", "n", F.sqrt(F.col("n").cast("double")).alias("wt"))
    tot = w.agg(F.sum("wt").alias("tw"))
    q = w.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n",
        F.round(F.col("wt") / F.col("tw") * MIX_ALPHA_BUDGET)
        .cast("bigint")
        .alias("quota"),
    )
    wnd = Window.partitionBy("lang").orderBy(
        hash32(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.select("doc_id", "lang", F.row_number().over(wnd).alias("rk"))
    return (
        ranked.join(F.broadcast(q), "lang")
        .where(F.col("rk") <= F.col("quota"))
        .groupBy("lang", F.col("n").alias("n_total"), "quota")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.min("doc_id").alias("min_doc"))
    )


@query(
    "warc_ingest_stats",
    oracle="""
    WITH ids AS (SELECT doc_id AS i FROM documents WHERE doc_id < 36),
    rec AS (
      SELECT i,
             CASE WHEN i % 2 = 0 THEN 'response' ELSE 'metadata' END
               AS warc_type,
             CASE WHEN i % 2 = 0
                  THEN CASE i % 6 WHEN 0 THEN 200 WHEN 2 THEN 404
                       ELSE 301 END END AS http_status,
             -- payload = 'doc-<i:02d>:' (7 bytes) + 'a' * (10 + i % 7)
             CAST(7 + 10 + i % 7 AS BIGINT) AS n_bytes
      FROM ids
    )
    SELECT warc_type, http_status,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(SUM(n_bytes) AS BIGINT) AS payload_bytes,
           CAST(COUNT(DISTINCT i) AS BIGINT) AS distinct_uris
    FROM rec GROUP BY warc_type, http_status
    """,
)
def warc_ingest_stats(spark, sf_dir):
    """WARC ingestion end-to-end (round 13 — Common Crawl is how a
    100 TB pretraining corpus ARRIVES): deterministic fixture
    ``.warc.gz`` files (3 files x 12 records, one gzip member per
    record per the Common Crawl convention, mtime pinned) go through
    the production ``read_warc`` path — file-parallel member indexing,
    record-parallel range-read + inflate + header parse, HTTP body
    extraction — then aggregate per (warc_type, http_status). DuckDB
    recomputes record counts, exact payload byte totals (headers
    stripped), and URI cardinality closed-form from the fixture
    formulas; a wrong member boundary, unstripped HTTP header, or
    status mis-parse shifts a sum and fails the hash.

    Scale shape: index tasks stream files in bounded chunks (inflated
    bytes discarded); parse parallelism tracks RECORD count via an
    explicit repartition, so one giant .warc.gz cannot serialize the
    stage; payloads never shuffle before the aggregate's partial
    (map-side) reduction. Ref parity: extension surface
    (the reference ingests fixed-length files only)."""
    from evolution_spark.io.warc import (
        build_warc_record,
        read_warc,
        write_warc_gz,
    )
    from evolution_spark.queries.base import query_tmp

    tmp = query_tmp("warc", sf_dir)
    import os

    os.makedirs(tmp, exist_ok=True)
    paths = []
    for k in range(3):
        recs = []
        for j in range(12):
            i = k * 12 + j
            body = f"doc-{i:02d}:".encode() + b"a" * (10 + i % 7)
            if i % 2 == 0:
                status = {0: "200 OK", 2: "404 Not Found",
                          4: "301 Moved Permanently"}[i % 6]
                payload = (f"HTTP/1.1 {status}\r\nContent-Type: "
                           "text/html\r\n\r\n").encode() + body
                recs.append(build_warc_record(
                    "response", f"http://example.com/{i}",
                    "2026-01-01T00:00:00Z", payload,
                    f"<urn:uuid:rec-{i}>",
                    content_type="application/http; msgtype=response"))
            else:
                recs.append(build_warc_record(
                    "metadata", f"http://example.com/{i}",
                    "2026-01-01T00:00:00Z", body,
                    f"<urn:uuid:rec-{i}>"))
        p = os.path.join(tmp, f"crawl-{k}.warc.gz")
        write_warc_gz(p, recs)
        paths.append(p)
    df = read_warc(spark, paths, records_per_partition=8)
    return (
        df.groupBy("warc_type", "http_status")
        .agg(
            F.count("*").alias("n_records"),
            F.sum("n_bytes").alias("payload_bytes"),
            F.countDistinct("uri").alias("distinct_uris"),
        )
    )


@query(
    "warc_media_probe",
    oracle="""
    WITH ids AS (SELECT doc_id AS i FROM documents WHERE doc_id < 24),
    rec AS (
      SELECT i,
             CASE i % 4 WHEN 0 THEN 'webp' WHEN 1 THEN 'png'
                  WHEN 2 THEN 'mp3' ELSE 'wav' END AS container,
             CASE i % 4 WHEN 0 THEN 'image' WHEN 1 THEN 'image'
                  ELSE 'audio' END AS kind,
             CASE i % 4
                  WHEN 0 THEN (10 + i % 5) * (6 + i % 3)
                  WHEN 1 THEN (8 + i % 4) * (5 + i % 2)
             END AS px,
             CASE i % 4
                  WHEN 2 THEN (8 + i % 5) * 1152 * 1000000 // 44100
                  WHEN 3 THEN (4000 + 10 * i) * 1000000 // 8000
             END AS dur
      FROM ids
    )
    SELECT container, kind,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(SUM(px) AS BIGINT) AS total_px,
           CAST(SUM(dur) AS BIGINT) AS total_dur_us
    FROM rec GROUP BY container, kind
    """,
)
def warc_media_probe(spark, sf_dir):
    """The COMPLETE ingest story end-to-end (round 13): media payloads
    arrive INSIDE WARC response records (as a scraped corpus does),
    flow through the production ``read_warc`` (member index ->
    range-read -> inflate -> HTTP body strip) into the unified
    ``probe_media`` dispatch, and aggregate per (container, kind).
    Fixtures rotate WebP (VP8L header dims), PNG (IHDR), MP3 (frame
    walk durations @44.1 kHz) and WAV (fmt/data chunks @8 kHz); DuckDB
    recomputes pixel and duration totals closed-form, so a wrong HTTP
    header strip (probe would see 'HTTP/...' not magic bytes), member
    boundary, or any walker regression fails the hash.

    Scale shape: both stages are the production ones — indexing is
    file-parallel bounded-memory, probe is header-only mapInPandas;
    payload bytes move once (the record-parallel repartition) and
    never again. Ref parity: extension surface."""
    import numpy as np
    import pandas as pd

    from evolution_spark.io.warc import (
        build_warc_record,
        read_warc,
        write_warc_gz,
    )
    from evolution_spark.operators.multimodal import (
        encode_png,
        encode_wav,
        probe_media,
    )
    from evolution_spark.operators.mp3 import build_mp3
    from evolution_spark.operators.webp import encode_webp
    from evolution_spark.queries.base import query_tmp

    import os

    tmp = query_tmp("warcmedia", sf_dir)
    os.makedirs(tmp, exist_ok=True)
    paths = []
    for k in range(2):
        recs = []
        for j in range(12):
            i = k * 12 + j
            v = i % 4
            if v == 0:
                img = np.zeros((6 + i % 3, 10 + i % 5, 3),
                               dtype=np.uint8)
                body, mime = encode_webp(img), "image/webp"
            elif v == 1:
                img = ((i + np.arange((5 + i % 2) * (8 + i % 4)))
                       % 256).astype(np.uint8).reshape(
                    5 + i % 2, 8 + i % 4)
                body, mime = encode_png(img), "image/png"
            elif v == 2:
                body, mime = build_mp3(8 + i % 5, bitrate_indices=9,
                                       sr_idx=0, seed=i), "audio/mpeg"
            else:
                n = 4000 + 10 * i
                sig = ((i * 37 + np.arange(n)) % 2001 - 1000)
                body, mime = encode_wav(sig, sample_rate=8000), \
                    "audio/wav"
            payload = (f"HTTP/1.1 200 OK\r\nContent-Type: {mime}"
                       "\r\n\r\n").encode() + body
            recs.append(build_warc_record(
                "response", f"http://media.example.com/{i}",
                "2026-01-01T00:00:00Z", payload, f"<urn:uuid:m-{i}>",
                content_type="application/http; msgtype=response"))
        p = os.path.join(tmp, f"media-{k}.warc.gz")
        write_warc_gz(p, recs)
        paths.append(p)
    rows = read_warc(spark, paths, records_per_partition=8)
    media = rows.select(
        F.regexp_extract("uri", r"/(\d+)$", 1).cast("long")
         .alias("media_id"),
        "payload",
    )
    probed = probe_media(media)
    return probed.groupBy("container", "kind").agg(
        F.count("*").alias("n_records"),
        F.sum(F.col("width") * F.col("height")).alias("total_px"),
        F.sum("duration_us").alias("total_dur_us"),
    )


@query(
    "arc_ingest_stats",
    oracle="""
    WITH ids AS (SELECT doc_id AS i FROM documents WHERE doc_id < 24),
    rec AS (
      SELECT i,
             CASE WHEN i % 3 = 0 THEN 'image/png' ELSE 'text/html' END
               AS content_type,
             -- payload = 'arc-<i:02d>|' (7 bytes) + 'c' * (12 + i % 5)
             CAST(7 + 12 + i % 5 AS BIGINT) AS n_bytes
      FROM ids
    )
    SELECT content_type,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(SUM(n_bytes) AS BIGINT) AS payload_bytes,
           CAST(COUNT(DISTINCT i) AS BIGINT) AS distinct_uris
    FROM rec GROUP BY content_type
    """,
)
def arc_ingest_stats(spark, sf_dir):
    """Legacy ARC ingestion end-to-end (round 13 — the pre-WARC
    Common Crawl packaging): two fixture ``.arc.gz`` files (12 records
    each plus their filedesc version record, one gzip member per
    record) through the production ``read_arc`` path; the filedesc
    rows filter out by URI scheme, and per-mime stats aggregate.
    DuckDB recomputes counts and exact payload byte totals from the
    fixture formulas.

    Scale shape: identical to read_warc — file-parallel bounded-memory
    indexing, record-parallel inflate+parse. Ref parity: extension
    surface."""
    import os

    from evolution_spark.io.warc import (
        build_arc_record,
        read_arc,
        write_warc_gz,
    )
    from evolution_spark.queries.base import query_tmp

    tmp = query_tmp("arc", sf_dir)
    os.makedirs(tmp, exist_ok=True)
    paths = []
    for k in range(2):
        recs = [build_arc_record(
            f"filedesc://crawl-{k}.arc", "0.0.0.0",
            "20260101000000", "text/plain", b"1 0 InternetArchive")]
        for j in range(12):
            i = k * 12 + j
            body = f"arc-{i:02d}|".encode() + b"c" * (12 + i % 5)
            mime = "image/png" if i % 3 == 0 else "text/html"
            recs.append(build_arc_record(
                f"http://arc.example.com/{i}", "10.0.0.9",
                "20260101000000", mime, body))
        p = os.path.join(tmp, f"crawl-{k}.arc.gz")
        write_warc_gz(p, recs)  # same member-per-record packaging
        paths.append(p)
    df = read_arc(spark, paths, records_per_partition=10)
    return (
        df.where(F.col("uri").startswith("http://"))
        .groupBy("content_type")
        .agg(
            F.count("*").alias("n_records"),
            F.sum("n_bytes").alias("payload_bytes"),
            F.countDistinct("uri").alias("distinct_uris"),
        )
    )


@query(
    "warc_html_text_stats",
    oracle="""
    WITH ids AS (SELECT doc_id AS i FROM documents WHERE doc_id < 36),
    rec AS (
      SELECT i,
             CASE i % 3 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'utf-16-le'
                  ELSE 'cp1252' END AS charset,
             -- p1 words + p2 words (nav/footer are boilerplate)
             CAST(18 + i % 9 + 21 + (i * 7) % 11 AS BIGINT) AS words,
             'Pagé ' || CAST(i AS VARCHAR) AS title
      FROM ids
    )
    SELECT charset,
           CAST(COUNT(*) AS BIGINT) AS n_pages,
           CAST(SUM(words) AS BIGINT) AS total_words,
           CAST(4 * COUNT(*) AS BIGINT) AS n_blocks,
           CAST(2 * COUNT(*) AS BIGINT) AS n_content_blocks,
           MIN(title) AS first_title
    FROM rec GROUP BY charset
    """,
)
def warc_html_text_stats(spark, sf_dir):
    """HTML -> text extraction end-to-end (round 14, VERDICT item 1 —
    the step that turns Common Crawl bytes into curatable documents):
    deterministic ``.warc.gz`` fixtures carry text/html responses in
    three charsets (utf-8 via <meta charset>, utf-16-le via BOM,
    latin-1 via <meta http-equiv> — normalized to cp1252 per WHATWG),
    each page a nav + two content paragraphs + an all-link footer.
    The production bridge (``warc_html_documents``: read_warc ->
    HTTP-200 text/html filter -> charset-sniffed decode -> block
    tokenizer -> WSDM-2010 boilerplate rules) must drop exactly the
    nav/footer blocks and keep both paragraphs; DuckDB recomputes
    per-charset page counts, extracted word totals, block counts and
    the lexicographic-min title (titles carry a non-ASCII 'é', so a
    mojibake'd decode in ANY of the three charsets shifts first_title
    and fails the hash).

    Scale shape: extraction is a partition-preserving mapInPandas over
    the WARC reader's record-parallel layout — page bytes move once
    (the record repartition) and never shuffle again; the aggregate
    reduces map-side to a 3-row result. Ref parity: extension surface
    (the reference ingests fixed-length files only)."""
    import os

    from evolution_spark.io.warc import build_warc_record, write_warc_gz
    from evolution_spark.operators.html import warc_html_documents
    from evolution_spark.queries.base import query_tmp

    tmp = query_tmp("warchtml", sf_dir)
    os.makedirs(tmp, exist_ok=True)
    paths = []
    for k in range(3):
        recs = []
        for j in range(12):
            i = k * 12 + j
            p1 = " ".join(f"t{i}w{m}" for m in range(18 + i % 9))
            p2 = " ".join(f"u{i}x{m}" for m in range(21 + (i * 7) % 11))
            meta = {
                0: '<meta charset="utf-8">',
                1: "",
                2: ('<meta http-equiv="Content-Type" content='
                    '"text/html; charset=iso-8859-1">'),
            }[i % 3]
            doc = (
                f"<html><head>{meta}<title>Pagé {i}</title>"
                "<script>var nav = '<p>js is not text</p>';</script>"
                "</head><body>"
                '<nav><a href="/">home</a> <a href="/a">about us</a>'
                ' <a href="/c">contact</a></nav>'
                f"<p>{p1}</p><p>{p2}</p>"
                "<footer><a>terms of use</a> <a>privacy policy</a>"
                "</footer></body></html>"
            )
            body = {
                0: doc.encode("utf-8"),
                1: b"\xff\xfe" + doc.encode("utf-16-le"),
                2: doc.encode("latin-1"),
            }[i % 3]
            payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html"
                       b"\r\n\r\n" + body)
            recs.append(build_warc_record(
                "response", f"http://html.example.com/{i}",
                "2026-01-01T00:00:00Z", payload, f"<urn:uuid:h-{i}>",
                content_type="application/http; msgtype=response"))
        p = os.path.join(tmp, f"crawl-{k}.warc.gz")
        write_warc_gz(p, recs)
        paths.append(p)
    docs = warc_html_documents(spark, paths, records_per_partition=8)
    return (
        docs.withColumn(
            "words", F.size(F.split(F.col("text"), r"\s+"))
        )
        .groupBy("charset")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum("words").cast("bigint").alias("total_words"),
            F.sum("n_blocks").cast("bigint").alias("n_blocks"),
            F.sum("n_content_blocks").cast("bigint")
            .alias("n_content_blocks"),
            F.min("title").alias("first_title"),
        )
    )


@query(
    "warc_revisit_dedup",
    oracle="""
    WITH ids AS (SELECT doc_id AS i FROM documents WHERE doc_id < 36),
    orig AS (SELECT i AS k FROM ids WHERE i < 6),
    rev AS (
      SELECT i, i % 5 AS k FROM ids
      WHERE i >= 6 AND (i % 10) <> 7
    )
    SELECT '<urn:uuid:rec-' || CAST(o.k AS VARCHAR) || '>'
             AS record_id,
           'http://r.example.com/' || CAST(o.k AS VARCHAR) AS uri,
           '2026-01-01T00:00:00Z' AS "date",
           'text/html' AS content_type,
           200 AS http_status,
           'sha1:FIX' || CAST(o.k AS VARCHAR) AS payload_digest,
           CAST(37 + 3 * o.k AS BIGINT) AS n_bytes,
           CAST(COUNT(r.i) AS BIGINT) AS n_revisits,
           CAST(COUNT(r.i) * (37 + 3 * o.k) AS BIGINT)
             AS dup_bytes_saved
    FROM orig o LEFT JOIN rev r ON r.k = o.k
    GROUP BY o.k
    """,
)
def warc_revisit_dedup(spark, sf_dir):
    """WARC ``revisit`` dedup semantics (round 14, VERDICT item 2 —
    the crawl's built-in URL-level dedup signal, consumed instead of
    merely surfaced): fixtures carry 6 originals and 27 participating
    revisits split across BOTH match paths — even ids link explicitly
    via ``WARC-Refers-To``, odd ids carry only the payload digest (the
    canonical-original fallback) — plus 3 ``server-not-modified``
    revisits that must be IGNORED (no payload-identity semantics) and
    one original with zero revisits (left-join fill). DuckDB recomputes
    the per-original revisit counts and saved-byte totals closed-form;
    a missed header, a profile filter regression, or digest/ref
    double-count shifts a row and fails the hash.

    Scale shape: ``collapse_revisits`` shuffles (id/digest, count)
    pairs only — original payload bytes are excluded from the output
    projection and never move. Ref parity: extension surface."""
    import os

    from evolution_spark.io.warc import build_warc_record, write_warc_gz
    from evolution_spark.operators.dedup import collapse_revisits
    from evolution_spark.queries.base import query_tmp

    tmp = query_tmp("warcrev", sf_dir)
    os.makedirs(tmp, exist_ok=True)
    rev_profile = ("http://netpreserve.org/warc/1.0/revisit/"
                   "identical-payload-digest")
    snm_profile = ("http://netpreserve.org/warc/1.0/revisit/"
                   "server-not-modified")
    paths = []
    for fk in range(3):
        recs = []
        for j in range(12):
            i = fk * 12 + j
            if i < 6:
                body = f"body-{i}:".encode() + b"x" * (30 + i * 3)
                payload = (b"HTTP/1.1 200 OK\r\nContent-Type: "
                           b"text/html\r\n\r\n" + body)
                recs.append(build_warc_record(
                    "response", f"http://r.example.com/{i}",
                    "2026-01-01T00:00:00Z", payload,
                    f"<urn:uuid:rec-{i}>",
                    content_type="application/http; msgtype=response",
                    extra_headers={
                        "WARC-Payload-Digest": f"sha1:FIX{i}"}))
            else:
                k = i % 5
                hdrs = {"WARC-Profile":
                        snm_profile if i % 10 == 7 else rev_profile}
                if i % 2 == 0:
                    hdrs["WARC-Refers-To"] = f"<urn:uuid:rec-{k}>"
                else:
                    hdrs["WARC-Payload-Digest"] = f"sha1:FIX{k}"
                recs.append(build_warc_record(
                    "revisit", f"http://r.example.com/{k}",
                    "2026-02-01T00:00:00Z", b"",
                    f"<urn:uuid:rev-{i}>",
                    content_type="message/http",
                    extra_headers=hdrs))
        p = os.path.join(tmp, f"crawl-{fk}.warc.gz")
        write_warc_gz(p, recs)
        paths.append(p)
    from evolution_spark.io.warc import read_warc

    df = read_warc(spark, paths, records_per_partition=8)
    return collapse_revisits(df)


@query(
    "crawl_html_pipeline",
    oracle="""
    WITH ids AS (SELECT doc_id AS i FROM documents WHERE doc_id < 24),
    p AS (
      SELECT i, i % 12 AS k,
             CASE (i % 12) % 4 WHEN 0 THEN 'en' WHEN 1 THEN 'de'
                  WHEN 2 THEN 'es' ELSE 'da' END AS lang
      FROM ids
    )
    SELECT lang AS pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_pages,
           CAST(SUM(CASE WHEN i < 12 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_canonical,
           MIN('Doc ' || lpad(CAST(k AS VARCHAR), 2, '0'))
             AS first_title
    FROM p GROUP BY lang
    """,
)
def crawl_html_pipeline(spark, sf_dir):
    """The COMPLETE crawl-curation story in one plan (round 14 — every
    stage is the production operator, chained): ``.warc.gz`` fixtures
    -> ``read_warc`` (member index, range-read, HTTP strip) ->
    ``warc_html_documents`` (charset sniff, block tokenizer, WSDM-2010
    boilerplate rules; nav/footer dropped, the one content paragraph
    kept) -> ``classify_language`` (broadcast trigram profiles, zero
    UDFs) -> ``dedup_exact`` (128-bit fingerprint, min-uri canonical).
    24 pages carry langid seed sentences in 4 languages, each page
    body duplicated once at a different URL (k = i mod 12), so the
    oracle recomputes per-language page counts, canonical (first-URL)
    counts, and the lexicographic-min title closed-form. A wrong
    charset decode, a boilerplate rule regression (nav text would
    poison the trigram profile), a misclassification, or a dedup
    fingerprint slip shifts a group and fails the hash.

    Scale shape: text moves ONCE (the WARC record repartition);
    extraction is partition-preserving; langid ships <= 20 (uri,
    lang) rows per doc (measured, BASELINE v5.2); dedup shuffles
    16-byte fingerprints + uris only. Ref parity: extension surface."""
    import os

    from evolution_spark.functions.langid import SEED_TEXTS, \
        classify_language
    from evolution_spark.io.warc import build_warc_record, write_warc_gz
    from evolution_spark.operators.dedup import dedup_exact
    from evolution_spark.operators.html import warc_html_documents
    from evolution_spark.queries.base import query_tmp

    langs = ["en", "de", "es", "da"]
    tmp = query_tmp("crawlpipe", sf_dir)
    os.makedirs(tmp, exist_ok=True)
    paths = []
    for fk in range(2):
        recs = []
        for j in range(12):
            i = fk * 12 + j
            k = i % 12
            lang = langs[k % 4]
            # k-specific tail token: pages k and k+12 are EXACT
            # duplicates, but the three k's of one language are not
            para = " ".join([SEED_TEXTS[lang]] * 4) + f" page{k:02d}"
            doc = (
                '<html><head><meta charset="utf-8">'
                f"<title>Doc {k:02d}</title></head><body>"
                '<nav><a href="/">home</a> <a href="/a">about us</a>'
                ' <a href="/c">contact</a></nav>'
                f"<p>{para}</p>"
                "<footer><a>terms of use</a> <a>privacy policy</a>"
                "</footer></body></html>"
            )
            payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html"
                       b"\r\n\r\n" + doc.encode("utf-8"))
            recs.append(build_warc_record(
                "response", f"http://c.example.com/{i:02d}",
                "2026-01-01T00:00:00Z", payload, f"<urn:uuid:c-{i}>",
                content_type="application/http; msgtype=response"))
        p = os.path.join(tmp, f"crawl-{fk}.warc.gz")
        write_warc_gz(p, recs)
        paths.append(p)
    docs = warc_html_documents(spark, paths, records_per_partition=8)
    # three consumers below (title projection, langid, dedup's two
    # scans): checkpoint so the WARC inflate + extraction mapInPandas
    # runs ONCE, not once per subtree (the repo's 3-consumer pattern,
    # cf. operators/dedup.semdedup)
    docs = docs.localCheckpoint(eager=False)
    langd = classify_language(docs.select("uri", "text"),
                              text_col="text", id_col="uri")
    kept = (
        dedup_exact(docs.select("uri", "text"), "text", "uri")
        .select("uri")
        .withColumn("is_canonical", F.lit(1))
    )
    return (
        docs.select("uri", "title")
        .join(langd, "uri")
        .join(kept, "uri", "left")
        .groupBy("pred_lang")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.coalesce(F.col("is_canonical"), F.lit(0)))
            .cast("bigint").alias("n_canonical"),
            F.min("title").alias("first_title"),
        )
    )


@query(
    "warc_link_graph",
    oracle="""
    WITH ids AS (SELECT doc_id AS i FROM documents WHERE doc_id < 20),
    v_edges AS (
      SELECT i AS src,
             ((i + j.v * 7) % 20) % 2 * 100 + (i + j.v * 7) % 20
               AS page_key
      FROM ids CROSS JOIN (SELECT UNNEST(range(1, 4)) AS v) j
      WHERE j.v < 2 + i % 3
    ),
    base_edges AS (
      SELECT i AS src, 100 + (i * 3) % 20 AS page_key
      FROM ids WHERE i % 5 = 1
    ),
    frag_edges AS (
      -- pages WITH a <base href> resolve their fragment-only link
      -- against the base URL (WHATWG quirk), which has no /pNN path
      -- and falls outside the internal predicate
      SELECT i AS src, (i % 2) * 100 + i AS page_key
      FROM ids WHERE i % 5 <> 1
    ),
    e AS (
      SELECT * FROM v_edges
      UNION ALL SELECT * FROM base_edges
      UNION ALL SELECT * FROM frag_edges
    )
    SELECT page_key,
           CAST(COUNT(*) AS BIGINT) AS in_degree,
           CAST(COUNT(DISTINCT src) AS BIGINT) AS n_sources,
           CAST(MIN(src) AS BIGINT) AS min_source
    FROM e GROUP BY page_key
    """,
)
def warc_link_graph(spark, sf_dir):
    """Crawl link-graph extraction end-to-end, now over RESOLVED
    canonical URLs (round 15 — real pages mix absolute and relative
    hrefs; a graph keyed on verbatim hrefs conflates them). 20
    fixture pages live at mixed-case-host default-port URLs
    ``http://G.Example.COM:80/d{i%2}/p{i}`` and carry internal links
    to dst=(i+7v)%20 for v=1..1+i%3, each written in a DIFFERENT
    reference form — absolute-path (v=1), scheme-relative with
    uppercase host + explicit :80 (v=2, canonicalization), dot-
    segment relative ``../d{k}/p{dst}`` (v=3). Pages with i%5==1
    add a ``<base href>`` pointing at /d1/ and a PLAIN-relative link
    that must resolve against the base (ignoring the base flips its
    directory and fails the hash). Every page has a ``#frag`` self
    link (fragment drop -> one self edge — except on base pages,
    where WHATWG resolves fragment-only refs against the BASE URL,
    which the internal predicate excludes), a ``mailto:`` link and an
    every-fifth-page external link (excluded by the internal
    predicate), and a ``<script>`` decoy href (raw-text skip). The
    page key is dir*100+dst so a wrong directory — the visible
    symptom of every resolution bug — shifts the key. DuckDB
    recomputes the in-degree aggregate closed-form.

    Scale shape: link extraction is partition-preserving (page bytes
    never shuffle; only (uri, href, raw, int) rows leave the scan);
    the in-degree aggregate reduces map-side. Ref parity: extension
    surface."""
    import os

    from evolution_spark.io.warc import build_warc_record, write_warc_gz
    from evolution_spark.operators.html import extract_html_links
    from evolution_spark.io.warc import read_warc
    from evolution_spark.queries.base import query_tmp

    tmp = query_tmp("warclinks", sf_dir)
    os.makedirs(tmp, exist_ok=True)
    paths = []
    for fk in range(2):
        recs = []
        for j in range(10):
            i = fk * 10 + j
            parts = []
            for v in range(1, 2 + i % 3):
                dst = (i + v * 7) % 20
                k = dst % 2
                if v == 1:
                    href = f"/d{k}/p{dst:02d}"
                elif v == 2:
                    href = f"//G.EXAMPLE.COM:80/d{k}/p{dst:02d}"
                else:
                    href = f"../d{k}/p{dst:02d}"
                parts.append(f'<a href="{href}">l{v}</a> ')
            base_tag = ""
            if i % 5 == 1:
                base_tag = '<base href="http://g.example.com/d1/">'
                parts.append(
                    f'<a href="p{(i * 3) % 20:02d}">b</a> ')
            parts.append('<a href="#frag">self</a> ')
            parts.append('<a href="mailto:u@e.x">m</a> ')
            if i % 5 == 0:
                parts.append(
                    f'<a href="https://ext.example.org/{i}">ext</a>')
            doc = (
                f"<html><head>{base_tag}<title>P{i}</title>"
                "<script>var decoy = '<a href=\"/d0/p99\">';</script>"
                f"</head><body><p>{''.join(parts)}</p></body></html>"
            )
            payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html"
                       b"\r\n\r\n" + doc.encode())
            recs.append(build_warc_record(
                "response",
                f"http://G.Example.COM:80/d{i % 2}/p{i:02d}",
                "2026-01-01T00:00:00Z", payload, f"<urn:uuid:g-{i}>",
                content_type="application/http; msgtype=response"))
        p = os.path.join(tmp, f"crawl-{fk}.warc.gz")
        write_warc_gz(p, recs)
        paths.append(p)
    recs_df = read_warc(spark, paths, records_per_partition=8)
    pages = recs_df.where(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("content_type").contains("text/html")
    )
    edges = extract_html_links(pages)
    internal = edges.where(
        F.col("href").rlike(r"^http://g\.example\.com/d[01]/p\d{2}$"))
    return (
        internal.select(
            F.regexp_extract("src_uri", r"/p(\d+)$", 1)
            .cast("bigint").alias("src"),
            (F.regexp_extract("href", r"/d([01])/", 1)
             .cast("bigint") * 100
             + F.regexp_extract("href", r"/p(\d+)$", 1)
             .cast("bigint")).alias("page_key"),
        )
        .groupBy("page_key")
        .agg(
            F.count(F.lit(1)).alias("in_degree"),
            F.countDistinct("src").alias("n_sources"),
            F.min("src").alias("min_source"),
        )
    )


@query(
    "warc_corrupt_skip",
    oracle="""
    WITH ids AS (SELECT doc_id AS i FROM documents WHERE doc_id < 30),
    ok AS (SELECT i FROM ids WHERE i % 5 <> 3)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(SUM(20 + i % 7) AS BIGINT) AS payload_bytes,
           CAST(MIN(i) AS BIGINT) AS first_id,
           CAST(MAX(i) AS BIGINT) AS last_id
    FROM ok
    """,
)
def warc_corrupt_skip(spark, sf_dir):
    """Per-record quarantine on the WARC reader (round 14 —
    ``on_error="skip"``: at 100 TB one mangled record must not abort a
    stage, mirroring the HTML decoder's total-decode posture): 30
    records across 3 files, every (i % 5 == 3) record corrupted with a
    Content-Length that overruns its block — a record-level fault the
    strict mode fails loudly on. Skip mode must keep EXACTLY the other
    24 records with their payloads intact; DuckDB recomputes the
    surviving ids and byte totals closed-form, so both over-skipping
    (dropping a healthy neighbor) and under-skipping (emitting a
    corrupt row) fail the hash.

    Scale shape: identical to warc_ingest_stats — the skip branch adds
    no exchange, it only drops rows inside the record-parallel parse
    stage. Ref parity: extension surface (the reference aborts on the
    first bad row by design — O9; this is the crawl-side complement
    where the data, not the schema, is the contract)."""
    import os

    from evolution_spark.io.warc import (
        build_warc_record,
        read_warc,
        write_warc_gz,
    )
    from evolution_spark.queries.base import query_tmp

    tmp = query_tmp("warcskip", sf_dir)
    os.makedirs(tmp, exist_ok=True)
    paths = []
    for fk in range(3):
        recs = []
        for j in range(10):
            i = fk * 10 + j
            body = f"r{i:02d}:".encode() + b"d" * (16 + i % 7)
            rec = build_warc_record(
                "resource", f"http://s.example.com/{i}",
                "2026-01-01T00:00:00Z", body, f"<urn:uuid:s-{i}>",
                content_type="text/plain")
            if i % 5 == 3:
                # Content-Length overrunning the block: a record-level
                # structural fault (the member still inflates)
                n = len(body)
                rec = rec.replace(
                    f"Content-Length: {n}".encode(),
                    f"Content-Length: {n + 500}".encode())
            recs.append(rec)
        p = os.path.join(tmp, f"crawl-{fk}.warc.gz")
        write_warc_gz(p, recs)
        paths.append(p)
    df = read_warc(spark, paths, records_per_partition=8,
                   on_error="skip")
    rid = F.regexp_extract("record_id", r"s-(\d+)", 1).cast("bigint")
    return df.agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum("n_bytes").alias("payload_bytes"),
        F.min(rid).alias("first_id"),
        F.max(rid).alias("last_id"),
    )


@query(
    "crawl_url_dedup",
    oracle="""
    WITH pages AS (SELECT doc_id AS p FROM documents WHERE doc_id < 8)
    SELECT p AS page,
           'urn:uuid:u-' || CAST(16 + p AS VARCHAR) AS winner_id,
           'http://site.example.com/page' || CAST(p AS VARCHAR)
             AS canonical_url,
           CAST(3 AS BIGINT) AS n_captures,
           'http://site.example.com/page'
             || CAST((p // 2) * 2 AS VARCHAR) AS rep_url,
           CAST(1 AS BIGINT) AS n_url_aliases,
           CAST(CASE WHEN p % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)
             AS is_canonical
    FROM pages
    """,
)
def crawl_url_dedup(spark, sf_dir):
    """Canonical-URL + digest two-level crawl dedup end-to-end
    (round 15 — the standard CC curation step before content dedup):
    8 fixture pages are each captured THREE times under trivially-
    different URIs (plain, UPPERCASE host + explicit :80, #fragment)
    at increasing WARC-Dates; ``dedup_crawl_urls`` must canonicalize
    the variants together (level 1: keep the latest capture,
    n_captures=3) and then collapse content aliases — page pairs
    (2k, 2k+1) share a payload digest, so the even page of each pair
    becomes the representative (level 2: n_url_aliases=1, the odd
    page flagged non-canonical). DuckDB recomputes every output
    column closed-form; a canonicalization miss splits a level-1
    group (n_captures shifts), a wrong keep-rule changes winner_id,
    a digest-collapse bug flips rep_url/is_canonical.

    Scale shape: bodies are projected away before the first exchange
    (payload never shuffles — the operator's contract); both levels
    are single hash-partitioned windows on metadata. Ref parity:
    extension surface."""
    import os

    from evolution_spark.io.warc import build_warc_record, write_warc_gz
    from evolution_spark.io.warc import read_warc
    from evolution_spark.operators.dedup import dedup_crawl_urls
    from evolution_spark.queries.base import query_tmp

    tmp = query_tmp("urldedup", sf_dir)
    os.makedirs(tmp, exist_ok=True)
    paths = []
    for fk in range(2):
        recs = []
        for j in range(12):
            i = fk * 12 + j
            p_id, k = i % 8, i // 8
            if k == 0:
                uri = f"http://site.example.com/page{p_id}"
            elif k == 1:
                uri = f"http://SITE.EXAMPLE.COM:80/page{p_id}"
            else:
                uri = f"http://site.example.com/page{p_id}#frag"
            body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html"
                    b"\r\n\r\n<html>" + str(p_id).encode() + b"</html>")
            recs.append(build_warc_record(
                "response", uri, f"2026-01-0{k + 1}T00:00:00Z",
                body, f"<urn:uuid:u-{i}>",
                content_type="application/http; msgtype=response",
                extra_headers={
                    "WARC-Payload-Digest": f"sha1:D{p_id // 2}"}))
        p = os.path.join(tmp, f"caps-{fk}.warc.gz")
        write_warc_gz(p, recs)
        paths.append(p)
    df = read_warc(spark, paths, records_per_partition=8)
    out = dedup_crawl_urls(df)
    return out.select(
        F.regexp_extract("canonical_url", r"page(\d+)$", 1)
        .cast("bigint").alias("page"),
        F.regexp_extract("record_id", r"<(.+)>", 1).alias("winner_id"),
        "canonical_url",
        F.col("n_captures").cast("long").alias("n_captures"),
        "rep_url",
        "n_url_aliases",
        F.col("is_content_canonical").cast("long")
        .alias("is_canonical"),
    )
