"""Training-corpus quality & curation queries: intra-document repetition
metrics (Gopher-style), rule-based quality filtering, benchmark n-gram
contamination screening, token-budget sequence packing, SCD2 changelog
compaction, and the real-BMP multimodal feature path.

These extend the LLM-pipeline surface (SURVEY.md §2.3 north star) past
dedup/similarity into the measurement side of corpus curation — the ops a
100 TB pretraining pipeline runs between ingestion and batch building.

Scale design:
* repetition/quality/contamination are explode + hash-agg pipelines — the
  shuffle keys are (doc_id, token-hash) pairs, never document bodies; all
  expressions are Spark built-ins (JVM, codegen).
* contamination broadcasts the benchmark gram set (benchmarks are small by
  construction); the corpus side never shuffles.
* packing is one shuffle on the shard key + one window cumsum.
* SCD2 is one shuffle on the entity key + two window passes sharing a sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from evolution_spark.operators.curation import pack_sequences
from evolution_spark.operators.temporal import scd2_from_changelog
from evolution_spark.queries.base import query, table

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_WORDS_SQL = f"string_split({_NORM_SQL}, ' ')"
_SHINGLES3_SQL = f"""
list_distinct(list_transform(
    range(greatest(len({_WORDS_SQL}) - 2, 1)),
    i -> array_to_string(({_WORDS_SQL})[i+1:i+3], ' ')))
""".strip()


def _words(col):
    from evolution_spark.functions.text import words

    return words(col)


# ---------------------------------------------------------------------------
# Intra-document repetition metrics (Gopher-style duplication signals)
# ---------------------------------------------------------------------------

@query(
    "repetition_metrics",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_WORDS_SQL} AS w,
             len(list_distinct({_SHINGLES3_SQL})) AS distinct_3grams,
             greatest(len({_WORDS_SQL}) - 2, 1) AS total_3grams
      FROM documents
    ),
    wc AS (
      SELECT doc_id, word, COUNT(*) AS cnt,
             MAX(n_words) AS n_words,
             MAX(distinct_3grams) AS distinct_3grams,
             MAX(total_3grams) AS total_3grams
      FROM (SELECT doc_id, unnest(w) AS word, len(w) AS n_words,
                   distinct_3grams, total_3grams FROM base)
      GROUP BY doc_id, word
    )
    SELECT doc_id,
           MAX(n_words) AS n_words,
           COUNT(*) AS n_distinct_words,
           1.0 - COUNT(*) * 1.0 / MAX(n_words) AS dup_word_frac,
           MAX(cnt) * 1.0 / MAX(n_words) AS top_word_frac,
           1.0 - MAX(distinct_3grams) * 1.0 / MAX(total_3grams) AS dup_3gram_frac
    FROM wc GROUP BY doc_id
    """,
)
def repetition_metrics(spark, sf_dir):
    """Per-document duplication signals (the Gopher repetition filters):
    duplicate-word fraction, most-frequent-word fraction, duplicate word
    3-gram fraction.

    Plan: ENTIRELY narrow — zero shuffles. The most-frequent-word count is
    the maximum run length over the SORTED word array (``array_sort`` +
    one ``aggregate`` fold per document, O(n log n) per doc inside
    codegen), so no token ever leaves its scan partition; every other
    metric is array arithmetic on the same row. At 100 TB this runs at
    scan speed; the explode+groupBy formulation it replaces shuffled every
    token twice (plan-gated: tests/test_plans.py asserts no Exchange)."""
    from evolution_spark.functions.text import word_shingles

    d = table(spark, sf_dir, "documents")
    w = _words(F.col("text"))
    base = d.select(
        F.col("doc_id"),
        w.alias("__w"),
        F.size(word_shingles(F.col("text"), 3)).alias("__d3"),
        F.greatest(F.size(w) - 2, F.lit(1)).alias("__t3"),
    )
    # max run length over the sorted array == max per-word count
    top_cnt = F.aggregate(
        F.array_sort("__w"),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(acc["prev"].eqNullSafe(x), acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(acc["prev"].eqNullSafe(x), acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    n = F.size("__w")
    n_distinct = F.size(F.array_distinct("__w"))
    return base.select(
        "doc_id",
        n.alias("n_words"),
        n_distinct.cast("bigint").alias("n_distinct_words"),
        (F.lit(1.0) - n_distinct * 1.0 / n).alias("dup_word_frac"),
        (top_cnt * 1.0 / n).alias("top_word_frac"),
        (F.lit(1.0) - F.col("__d3") * 1.0 / F.col("__t3")).alias("dup_3gram_frac"),
    )


@query(
    "quality_filter_gopher",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, lang,
             len({_WORDS_SQL}) AS n_words,
             len(list_distinct({_WORDS_SQL})) AS n_distinct,
             (length({_NORM_SQL}) - (len({_WORDS_SQL}) - 1)) * 1.0
               / len({_WORDS_SQL}) AS mean_word_len
      FROM documents
    )
    SELECT doc_id, lang, n_words, mean_word_len,
           1.0 - n_distinct * 1.0 / n_words AS dup_word_frac
    FROM m
    WHERE n_words BETWEEN 20 AND 100000
      AND mean_word_len BETWEEN 2 AND 10
      AND 1.0 - n_distinct * 1.0 / n_words < 0.55
    """,
)
def quality_filter_gopher(spark, sf_dir):
    """Rule-based document quality gate (Gopher-style): word-count range,
    mean word length range, duplicate-word-fraction ceiling. Pure narrow
    projection + filter — no shuffle at all; at 100 TB this runs at scan
    speed with the predicate evaluated inside codegen."""
    d = table(spark, sf_dir, "documents")
    from evolution_spark.functions.text import norm_text

    w = _words(F.col("text"))
    n_words = F.size(w)
    n_distinct = F.size(F.array_distinct(w))
    mean_wl = (F.length(norm_text(F.col("text"))) - (n_words - 1)) * 1.0 / n_words
    dup_frac = F.lit(1.0) - n_distinct * 1.0 / n_words
    return (
        d.select(
            "doc_id",
            "lang",
            n_words.alias("n_words"),
            mean_wl.alias("mean_word_len"),
            dup_frac.alias("dup_word_frac"),
        )
        .where(
            F.col("n_words").between(20, 100000)
            & F.col("mean_word_len").between(2, 10)
            & (F.col("dup_word_frac") < 0.55)
        )
    )


# ---------------------------------------------------------------------------
# Benchmark contamination screening
# ---------------------------------------------------------------------------

@query(
    "ngram_contamination",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id, unnest({_SHINGLES3_SQL}) AS g FROM documents
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
    SELECT grams.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN bench.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS contaminated_grams,
           SUM(CASE WHEN bench.g IS NOT NULL THEN 1.0 ELSE 0.0 END) / COUNT(*)
             AS contamination_frac,
           grams.doc_id % 97 = 0 AS is_benchmark
    FROM grams LEFT JOIN bench ON grams.g = bench.g
    GROUP BY grams.doc_id
    """,
)
def ngram_contamination(spark, sf_dir):
    """Benchmark-contamination screen: fraction of each document's distinct
    word 3-grams that appear in a benchmark set (here: every 97th document
    stands in for the eval benchmark).

    Scale shape: the benchmark gram set is DISTINCT-reduced then BROADCAST —
    the 100 TB corpus side is explode + broadcast-hash-join + hash-agg on
    doc_id, with no corpus shuffle on gram text. Grams join on a 60-bit
    hash, not the string: the broadcast table and the join keys are 8-byte
    ints (collision odds ~n_bench*n_doc_grams/2^60 — nil for any real eval
    suite). Benchmarks are small by construction; if one weren't, the join
    falls back to a sort-merge on the hash key."""
    from evolution_spark.functions.text import hash60, word_shingles

    d = table(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 3)).alias("__g")
    ).select("doc_id", hash60(F.col("__g")).alias("__gh"))
    bench = (
        grams.where(F.col("doc_id") % 97 == 0)
        .select("__gh")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    joined = grams.join(F.broadcast(bench), "__gh", "left")
    hit = F.when(F.col("__hit").isNotNull(), 1).otherwise(0)
    hit_f = F.when(F.col("__hit").isNotNull(), 1.0).otherwise(0.0)
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(hit).cast("bigint").alias("contaminated_grams"),
        (F.sum(hit_f) / F.count(F.lit(1))).alias("contamination_frac"),
        (F.first(F.col("doc_id") % 97 == 0)).alias("is_benchmark"),
    )


# ---------------------------------------------------------------------------
# Token-budget sequence packing
# ---------------------------------------------------------------------------

@query(
    "pack_sequences_budget",
    oracle=f"""
    WITH t AS (
      SELECT lang, doc_id, len({_WORDS_SQL}) AS n_tokens FROM documents
    ),
    p AS (
      SELECT lang, n_tokens,
             CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512.0)
             AS BIGINT) AS pack_id
      FROM t
    )
    SELECT lang, pack_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
    FROM p GROUP BY lang, pack_id
    """,
)
def pack_sequences_budget(spark, sf_dir):
    """Sequence-packing planner: assign documents to 512-token training
    packs per language (contiguous fill in doc_id order), then summarize
    each pack. One shuffle on the shard key (lang), one window cumsum, one
    hash-agg — see operators/curation.py:pack_sequences for the 100 TB
    sharding note."""
    d = table(spark, sf_dir, "documents")
    t = d.select("lang", "doc_id", F.size(_words(F.col("text"))).alias("n_tokens"))
    packed = pack_sequences(t, "n_tokens", 512, by="lang", order="doc_id")
    return packed.groupBy("lang", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
    )


# ---------------------------------------------------------------------------
# SCD2 validity intervals from the events changelog
# ---------------------------------------------------------------------------

@query(
    "scd2_user_status",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    iv AS (
      SELECT user_id, event_type, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM changes
    )
    SELECT user_id, event_type,
           strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(valid_to, '%Y-%m-%d %H:%M:%S') AS valid_to,
           valid_to IS NULL AS is_current
    FROM iv
    """,
)
def scd2_user_status(spark, sf_dir):
    """Slowly-changing-dimension type 2 from the events changelog: one
    validity interval per per-user event_type regime (consecutive repeats
    collapse; NULL valid_to marks the current regime). See
    operators/temporal.py:scd2_from_changelog for the single-shuffle,
    shared-sort plan."""
    e = table(spark, sf_dir, "events")
    iv = scd2_from_changelog(
        e.select("user_id", "ts", "event_id", "event_type"),
        key="user_id",
        order_col="ts",
        attr_cols=["event_type"],
        tiebreak="event_id",
    )
    return iv.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        "is_current",
    )


# ---------------------------------------------------------------------------
# Multimodal: real BMP decode end-to-end (rows-only: binary codec path)
# ---------------------------------------------------------------------------

@query(
    "multimodal_bmp_features",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 64),
    ts AS (SELECT doc_id, UNNEST(range(192)) AS t FROM ids),
    v AS (
      SELECT doc_id, CAST(t // 12 AS INT) AS bucket,
             (t * (doc_id + 3)) % 251 AS val
      FROM ts
    ),
    f AS (SELECT doc_id, bucket, AVG(val) AS m FROM v GROUP BY 1, 2)
    SELECT doc_id AS media_id, 'image' AS kind, 246 AS n_bytes,
           ROUND(MAX(CASE WHEN bucket = 0 THEN m END), 3) AS f0,
           ROUND(MAX(CASE WHEN bucket = 7 THEN m END), 3) AS f7,
           ROUND(MAX(CASE WHEN bucket = 15 THEN m END), 3) AS f15
    FROM f GROUP BY doc_id
    """,
)
def multimodal_bmp_features(spark, sf_dir):
    """REAL 24-bit BMP codec end-to-end WITH a value-level oracle:
    deterministically synthesize an 8x8 BMP per document id (pure-numpy
    encoder), run the production ``extract_features`` path with
    ``fake=False`` (magic-byte dispatch to the real decoder), and emit
    scalar feature summaries. The pixels are the closed form
    ((t*(id+3)) mod 251) and decode is pixel-exact, so DuckDB recomputes
    the 16-bucket mean-pool features from first principles with
    generate_series — the oracle hash-checks the whole
    encode->decode->pool path (n_bytes = 54-byte header + 8 rows x 24-byte
    stride = 246). Bucket means are exact integer sums over 12 values
    divided once — bit-identical across engines.

    Scale shape: generation and decode are both partition-local mapInPandas
    (Arrow-batched, no shuffle); media bytes never leave their partition."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        extract_features,
    )

    d = table(spark, sf_dir, "documents").select("doc_id").where(F.col("doc_id") < 64)

    def gen(batches):
        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                px = (
                    (np.arange(8 * 8 * 3, dtype=np.int64) * (int(i) + 3)) % 251
                ).astype(np.uint8).reshape(8, 8, 3)
                payloads.append(encode_bmp(px))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "image",
                    "payload": payloads,
                    "mime": "image/bmp",
                    "width": 8,
                    "height": 8,
                    "duration_ms": None,
                }
            )

    media = d.mapInPandas(gen, MEDIA_SCHEMA)
    feats = extract_features(media, fake=False)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.round(F.element_at("features", 1).cast("double"), 3).alias("f0"),
        F.round(F.element_at("features", 8).cast("double"), 3).alias("f7"),
        F.round(F.element_at("features", 16).cast("double"), 3).alias("f15"),
    )


def _dhash_planted_oracle() -> str:
    """Closed-form oracle for multimodal_dhash_neardup: the payload set is
    a pure function of doc_id (present as 0..47 at every sf), so the full
    expected pair list is computable locally — same straight-line codec
    (encode_bmp + dhash_bits) the distributed pipeline batches, ALL pairs
    popcount-checked (coincidental near-dups would be enumerated too, not
    just the planted ones). The SQL is a VALUES literal of that list,
    which makes the driver check verify the distributed machinery end to
    end: mapInPandas batching, the 4x16-bit band self-join, and the
    candidate dedup."""
    import numpy as np

    from evolution_spark.operators.multimodal import dhash_bits, encode_bmp

    hashes: dict[int, int] = {}
    for i in range(48):
        px = (
            (np.arange(16 * 16 * 3, dtype=np.int64) * (i + 7)) % 241
        ).astype(np.uint8).reshape(16, 16, 3)
        hashes[i] = dhash_bits(encode_bmp(px))
        if i % 8 == 0:
            hashes[i + 100000] = dhash_bits(encode_bmp(px + 4))
    ids = sorted(hashes)
    rows = []
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            h = bin((hashes[a] ^ hashes[b]) & (2**64 - 1)).count("1")
            if h <= 3:
                rows.append(f"({a}, {b}, {h})")
    values = ", ".join(rows)
    return (
        "SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b, "
        "CAST(hamming AS INT) AS hamming "
        f"FROM (VALUES {values}) AS t(id_a, id_b, hamming) ORDER BY id_a, id_b"
    )


@query("multimodal_dhash_neardup", oracle=_dhash_planted_oracle())
def multimodal_dhash_neardup(spark, sf_dir):
    """Perceptual image dedup on the REAL BMP codec: every 8th document id
    gets a +4-brightness copy of its synthesized image — byte-different,
    so exact/raw-hash dedup misses it, but dHash is brightness-invariant
    (difference bits compare adjacent luma cells), so each planted pair
    surfaces at hamming 0 through the banded near-dup join
    (operators/multimodal.dhash_images / dhash_near_dups).

    Oracle: closed-form VALUES list computed locally from the same pure
    payload function (see _dhash_planted_oracle). Output is deterministic:
    payloads are pure functions of media_id.

    Scale shape: hashing is partition-local mapInPandas (payload bytes
    never shuffle; 16-byte hashes do); candidate pairs come from 16-bit
    band equality self-joins — the SimHash pigeonhole, no all-pairs."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.multimodal import (
        dhash_images,
        dhash_near_dups,
    )

    d = table(spark, sf_dir, "documents").select("doc_id").where(F.col("doc_id") < 48)

    def gen(batches):
        from evolution_spark.operators.multimodal import encode_bmp

        for pdf in batches:
            ids, payloads = [], []
            for i in pdf["doc_id"]:
                px = (
                    (np.arange(16 * 16 * 3, dtype=np.int64) * (int(i) + 7)) % 241
                ).astype(np.uint8).reshape(16, 16, 3)
                ids.append(int(i))
                payloads.append(encode_bmp(px))
                if int(i) % 8 == 0:
                    ids.append(int(i) + 100000)
                    payloads.append(encode_bmp(px + 4))  # brightness shift
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = d.mapInPandas(
        gen, "media_id BIGINT, payload BINARY"
    )
    hashes = dhash_images(media, fake=False)
    return dhash_near_dups(hashes, max_hamming=3).orderBy("id_a", "id_b")


@query(
    "multimodal_png_features",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 40),
    px AS (
      SELECT doc_id,
             (3 * doc_id + 5 * x.v + 7 * y.v + 11 * c.v) % 256 AS v
      FROM ids
      CROSS JOIN (SELECT UNNEST(range(32)) AS v) x
      CROSS JOIN (SELECT UNNEST(range(24)) AS v) y
      CROSS JOIN (SELECT UNNEST(range(3)) AS v) c
    )
    SELECT doc_id AS media_id,
           CAST(doc_id % 5 AS INT) AS png_filter,
           CAST(32 AS INT) AS width, CAST(24 AS INT) AS height,
           CAST(SUM(v) AS BIGINT) AS pixel_sum,
           SUM(v) * 1.0 / COUNT(*) AS mean_px
    FROM px GROUP BY doc_id
    """,
)
def multimodal_png_features(spark, sf_dir):
    """REAL PNG codec end-to-end WITH a value-level oracle — the query that
    flips the multimodal component's last stub into capability: each
    document id gets a deterministic 32x24 RGB image v(x,y,c) = (3*id +
    5*x + 7*y + 11*c) mod 256, encoded to actual PNG bytes with scanline
    filter ``id % 5`` (so all five reconstruction paths — None/Sub/Up/
    Average/Paeth — execute against the driver's hash check), then decoded
    back through the production dispatch (``decode_media`` -> stdlib-zlib
    ``decode_png``) and reduced to pixel statistics. The pixel function is
    closed-form, so DuckDB recomputes the same statistics from first
    principles — one wrong reconstructed byte anywhere changes pixel_sum
    and fails the hash. All arithmetic exact ints until one IEEE division.

    Scale shape: synthesis/encode/decode are partition-local mapInPandas
    (Arrow batches); image bytes never shuffle — only the 6-column feature
    rows do."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.multimodal import decode_media, encode_png

    d = table(spark, sf_dir, "documents").select("doc_id").where(F.col("doc_id") < 40)

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                y, x, c = np.meshgrid(
                    np.arange(24), np.arange(32), np.arange(3), indexing="ij"
                )
                img = ((3 * i + 5 * x + 7 * y + 11 * c) % 256).astype(np.uint8)
                payload = encode_png(img, filter_type=i % 5)
                flat = decode_media(payload, "image")  # production dispatch
                h, w = img.shape[0], img.shape[1]
                s = int(np.sum(flat.astype(np.int64)))
                rows.append((i, i % 5, w, h, s, s / flat.size))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "png_filter", "width", "height",
                         "pixel_sum", "mean_px"],
            )

    return d.mapInPandas(
        gen,
        "media_id long, png_filter int, width int, height int, "
        "pixel_sum long, mean_px double",
    )


# ---------------------------------------------------------------------------
# End-to-end curation pipeline (the user story, one query)
# ---------------------------------------------------------------------------

_HASH_SQL = "('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT"


@query(
    "corpus_curation_pipeline",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, lang, n_chars,
             len({_WORDS_SQL}) AS n_words,
             md5({_NORM_SQL}) AS fp
      FROM documents
      WHERE len({_WORDS_SQL}) BETWEEN 20 AND 100000
        AND (length({_NORM_SQL}) - (len({_WORDS_SQL}) - 1)) * 1.0
              / len({_WORDS_SQL}) BETWEEN 2 AND 10
        AND 1.0 - len(list_distinct({_WORDS_SQL})) * 1.0 / len({_WORDS_SQL}) < 0.55
    ),
    keep AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY fp)
    SELECT lang,
           CASE WHEN {_HASH_SQL} % 100 < 90 THEN 'train' ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM q JOIN keep USING (doc_id)
    GROUP BY 1, 2
    """,
)
def corpus_curation_pipeline(spark, sf_dir):
    """The full curation pass in one declarative plan: quality gate (narrow
    filter) -> exact near-dup removal (fingerprint group, min-id keeper,
    semi-join back) -> deterministic train/test split (content hash) ->
    per-(lang, split) accounting. Composes the quality, dedup, and split
    primitives exactly as a production 100 TB pipeline chains them; one
    scan, two hash shuffles (fingerprint, final group), no RNG anywhere.

    Exact dedup runs as ONE row_number window over the fingerprint (keep
    rank 1 = min doc_id) instead of groupBy + semi-join back: the quality
    projection is computed once and shuffled once, not re-derived for each
    side of a join (measured 1.8 s -> 1.1 s at sf0.1)."""
    from pyspark.sql.window import Window

    from evolution_spark.functions.text import fingerprint128, hash32, norm_text

    d = table(spark, sf_dir, "documents")
    w = _words(F.col("text"))
    n_words = F.size(w)
    n_distinct = F.size(F.array_distinct(w))
    mean_wl = (F.length(norm_text(F.col("text"))) - (n_words - 1)) * 1.0 / n_words
    dup_frac = F.lit(1.0) - n_distinct * 1.0 / n_words
    q = d.select(
        "doc_id", "lang", "n_chars", n_words.alias("n_words"),
        fingerprint128(F.col("text")).alias("__fp"),
    ).where(
        n_words.between(20, 100000)
        & mean_wl.between(2, 10)
        & (dup_frac < 0.55)
    )
    w_fp = Window.partitionBy("__fp").orderBy("doc_id")
    dd = (
        q.withColumn("__rn", F.row_number().over(w_fp))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    split = F.when(
        hash32(F.col("doc_id").cast("string")) % 100 < 90, "train"
    ).otherwise("test")
    return dd.groupBy("lang", split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@query(
    "multimodal_wav_features",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 48),
    ts AS (SELECT doc_id, UNNEST(range(4000)) AS t FROM ids),
    sig AS (
      SELECT doc_id, t, ((t * (doc_id + 7)) % 2003) - 1001 AS v FROM ts
    ),
    paired AS (
      SELECT doc_id, v,
             LEAD(v) OVER (PARTITION BY doc_id ORDER BY t) AS nv
      FROM sig
    )
    SELECT doc_id AS media_id,
           COUNT(*) AS n_samples,
           CAST(COUNT(*) * 1000 / 16000 AS BIGINT) AS duration_ms,
           ROUND(SQRT(CAST(SUM(v * v) AS DOUBLE) / COUNT(*)), 3) AS rms,
           ROUND(CAST(SUM(CASE WHEN v * nv < 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / (COUNT(*) - 1), 6) AS zcr
    FROM paired GROUP BY doc_id
    """,
)
def multimodal_wav_features(spark, sf_dir):
    """REAL 16-bit PCM WAV codec end-to-end WITH a value-level oracle: each
    document id gets a deterministic integer signal s_t = ((t*(id+7)) mod
    2003) - 1001 (4000 samples @ 16 kHz), encoded to actual RIFF/WAVE bytes
    (operators/multimodal.encode_wav), decoded back through the production
    chunk-walking parser, and reduced to audio features — RMS energy and
    zero-crossing rate. Because the signal is a closed form, DuckDB
    recomputes the SAME features from first principles with generate_series
    — so the oracle hash-checks the entire encode->decode->feature path,
    not just row counts. All arithmetic is exact integers until one final
    division+sqrt (IEEE-correctly-rounded on both engines).

    Scale shape: synthesis and feature extraction are partition-local
    mapInPandas (Arrow batches); audio bytes never shuffle — only the
    5-column feature rows do."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.multimodal import decode_wav, encode_wav

    d = table(spark, sf_dir, "documents").select("doc_id").where(F.col("doc_id") < 48)

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                t = np.arange(4000, dtype=np.int64)
                s = (((t * (int(i) + 7)) % 2003) - 1001).astype(np.int16)
                payload = encode_wav(s, 16000)
                samples, rate = decode_wav(payload)
                v = samples[:, 0].astype(np.int64)
                n = len(v)
                rms = round(float(np.sqrt(float(np.sum(v * v)) / n)), 3)
                zcr = round(float(np.sum(v[:-1] * v[1:] < 0)) / (n - 1), 6)
                rows.append((int(i), n, n * 1000 // rate, rms, zcr))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "duration_ms", "rms", "zcr"]
            )

    return d.mapInPandas(
        gen,
        "media_id long, n_samples long, duration_ms long, rms double, zcr double",
    )


@query(
    "multimodal_jpeg_features",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 40),
    blocks AS (
      SELECT doc_id, 2 * ((3 * doc_id + 5 * bx.v + 7 * by.v) % 128) AS v
      FROM ids
      CROSS JOIN (SELECT UNNEST(range(4)) AS v) bx
      CROSS JOIN (SELECT UNNEST(range(3)) AS v) by
    )
    SELECT doc_id AS media_id,
           CAST(32 AS INT) AS width, CAST(24 AS INT) AS height,
           CAST(SUM(64 * v) AS BIGINT) AS pixel_sum,
           SUM(64 * v) * 1.0 / 768 AS mean_px
    FROM blocks GROUP BY doc_id
    """,
)
def multimodal_jpeg_features(spark, sf_dir):
    """REAL JPEG codec end-to-end with a value-level oracle — the query
    that closes the multimodal component's last real-image
    NotImplementedError (real corpora are JPEG-heavy): each document id
    gets a 32x24 grayscale image whose 8x8 tiles are CONSTANT with value
    2*((3*id + 5*bx + 7*by) mod 128). A constant tile survives the lossy
    pipeline EXACTLY — its DCT is DC-only, even values quantize without
    remainder under the Annex K table's q00=16, and the DC-only IDCT is
    the constant again — so the full encoder/decoder chain (level shift,
    DCT, quantization, zigzag, DC-prediction Huffman coding, byte
    stuffing, and back) is bit-reproducible and DuckDB recomputes the
    same pixel sums from the closed form. One wrong bit anywhere in the
    entropy stream or a mis-seeded DC predictor changes pixel_sum and
    fails the hash.

    ODD ids encode PROGRESSIVE (SOF2 — DC/AC spectral bands + successive
    approximation) and even ids baseline (SOF0); both route through the
    production ``decode_media`` magic-byte dispatch, and because
    progressive is a transmission reordering of the SAME quantized
    coefficients, the one closed-form oracle pins both decoders to exact
    pixels. (The lossy AC paths are covered by roundtrip tolerance tests
    in tests/test_operators.py — closed-form oracles and quantization
    loss are mutually exclusive by nature.)

    Scale shape: synthesis/encode/decode are partition-local mapInPandas
    (Arrow batches); image bytes never shuffle — only the 5-column
    feature rows do."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.multimodal import (
        decode_media,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 40
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                img = np.zeros((24, 32), dtype=np.uint8)
                for by in range(3):
                    for bx in range(4):
                        img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = (
                            2 * ((3 * i + 5 * bx + 7 * by) % 128)
                        )
                enc = encode_jpeg_progressive if i % 2 else encode_jpeg
                payload = enc(img, quality=50)
                flat = decode_media(payload, "image")  # production dispatch
                s = int(np.sum(flat.astype(np.int64)))
                rows.append((i, 32, 24, s, s / flat.size))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "pixel_sum", "mean_px"],
            )

    return d.mapInPandas(
        gen,
        "media_id long, width int, height int, pixel_sum long, mean_px double",
    )


@query(
    "multimodal_arith_jpeg_features",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 36),
    blocks AS (
      SELECT doc_id, 2 * ((5 * doc_id + 3 * bx.v + 11 * by.v) % 128) AS v
      FROM ids
      CROSS JOIN (SELECT UNNEST(range(4)) AS v) bx
      CROSS JOIN (SELECT UNNEST(range(3)) AS v) by
    )
    SELECT doc_id AS media_id,
           CAST(32 AS INT) AS width, CAST(24 AS INT) AS height,
           CAST(SUM(64 * v) AS BIGINT) AS pixel_sum,
           SUM(64 * v) * 1.0 / 768 AS mean_px
    FROM blocks GROUP BY doc_id
    """,
)
def multimodal_arith_jpeg_features(spark, sf_dir):
    """ARITHMETIC-coded JPEG end-to-end (round 11 — closes the engine's
    LAST declared refusal): the constant-tile closed form from
    ``multimodal_jpeg_features`` (a constant 8x8 tile survives the lossy
    pipeline exactly: DC-only DCT, remainder-free quantization) with a
    different coefficient mix, pushed through the T.81 Annex D QM-coder
    instead of Huffman. doc_id % 3 routes the THREE arithmetic paths:
    0 -> SOF9 sequential, 1 -> SOF10 progressive (DC first/refine + AC
    first/refine scans), 2 -> SOF9 with restart intervals (per-RSTn
    coder + statistics resets). All decode through the production
    ``decode_media`` magic-byte dispatch; DuckDB recomputes the exact
    pixel sums from the closed form — one wrong binary decision in the
    QM coder, the Table D.3 state machine, the DC/AC decision trees, or
    the restart resets moves pixel_sum and fails the hash.

    Scale shape: synthesis/encode/decode are partition-local mapInPandas
    (Arrow batches); image bytes never shuffle — only the 5-column
    feature rows do. The QM coder is inherently sequential (each binary
    decision updates the state the next reads), so this path is scalar
    Python BY NATURE, not oversight — arithmetic JPEGs are vanishingly
    rare in real corpora and the common SOF0/SOF2 paths stay vectorized.
    Ref parity: the reference has no image codecs (extension surface)."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.jpeg_arith import (
        encode_jpeg_arithmetic,
        encode_jpeg_arithmetic_progressive,
    )
    from evolution_spark.operators.multimodal import decode_media

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 36
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                img = np.zeros((24, 32), dtype=np.uint8)
                for by in range(3):
                    for bx in range(4):
                        img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = (
                            2 * ((5 * i + 3 * bx + 11 * by) % 128)
                        )
                if i % 3 == 0:
                    payload = encode_jpeg_arithmetic(img, quality=50)
                elif i % 3 == 1:
                    payload = encode_jpeg_arithmetic_progressive(
                        img, quality=50
                    )
                else:
                    payload = encode_jpeg_arithmetic(
                        img, quality=50, restart_interval=2
                    )
                flat = decode_media(payload, "image")  # production dispatch
                s = int(np.sum(flat.astype(np.int64)))
                rows.append((i, 32, 24, s, s / flat.size))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height",
                         "pixel_sum", "mean_px"],
            )

    return d.mapInPandas(
        gen,
        "media_id long, width int, height int, pixel_sum long, mean_px double",
    )


@query(
    "multimodal_lossless_jpeg_features",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 30),
    px AS (
      SELECT doc_id,
             (7 * doc_id + 3 * x.v + 11 * y.v) % 256 AS v
      FROM ids
      CROSS JOIN (SELECT UNNEST(range(32)) AS v) x
      CROSS JOIN (SELECT UNNEST(range(24)) AS v) y
    )
    SELECT doc_id AS media_id,
           CAST(32 AS INT) AS width, CAST(24 AS INT) AS height,
           CAST(SUM(v) AS BIGINT) AS pixel_sum,
           SUM(v) * 1.0 / 768 AS mean_px
    FROM px GROUP BY doc_id
    """,
)
def multimodal_lossless_jpeg_features(spark, sf_dir):
    """LOSSLESS JPEG (SOF3, T.81 Annex H) end-to-end: each document id
    gets a 32x24 grayscale image with pixel (y, x) = (7*id + 3*x + 11*y)
    mod 256 — ARBITRARY per-pixel content, no constant-tile constraint,
    because losslessness means the decoded plane equals the input
    exactly. doc_id rotates the 7 Annex H predictors (doc_id % 7 + 1)
    and every third id adds restart intervals, so every predictor path
    and the restart reset rule sit under the oracle: DuckDB recomputes
    the exact pixel sums from the closed form, and one wrong predicted
    sample anywhere shifts pixel_sum and fails the hash. Decode goes
    through the production ``decode_media`` dispatch.

    Scale shape: partition-local mapInPandas; image bytes never shuffle.
    The predictive entropy loop is inherently sequential (each
    prediction needs the previous decoded sample) — scalar Python by
    nature, a completeness path like the arithmetic coder.
    Ref parity: the reference has no image codecs (extension surface)."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.jpeg_lossless import encode_jpeg_lossless
    from evolution_spark.operators.multimodal import decode_media

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 30
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                yy, xx = np.mgrid[0:24, 0:32]
                img = ((7 * i + 3 * xx + 11 * yy) % 256).astype(np.uint8)
                payload = encode_jpeg_lossless(
                    img,
                    predictor=i % 7 + 1,
                    restart_interval=4 if i % 3 == 0 else 0,
                )
                flat = decode_media(payload, "image")
                s = int(np.sum(flat.astype(np.int64)))
                rows.append((i, 32, 24, s, s / flat.size))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height",
                         "pixel_sum", "mean_px"],
            )

    return d.mapInPandas(
        gen,
        "media_id long, width int, height int, pixel_sum long, mean_px double",
    )


@query(
    "multimodal_hier_jpeg_features",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 24),
    px AS (
      SELECT doc_id,
             (13 * doc_id + 5 * x.v + 3 * y.v) % 256 AS v
      FROM ids
      CROSS JOIN (SELECT UNNEST(range(32)) AS v) x
      CROSS JOIN (SELECT UNNEST(range(32)) AS v) y
    )
    SELECT doc_id AS media_id,
           CAST(32 AS INT) AS width, CAST(32 AS INT) AS height,
           CAST(SUM(v) AS BIGINT) AS pixel_sum,
           SUM(v) * 1.0 / 1024 AS mean_px
    FROM px GROUP BY doc_id
    """,
)
def multimodal_hier_jpeg_features(spark, sf_dir):
    """HIERARCHICAL JPEG (DHP + differential frames, T.81 SS13/Annex J —
    round 11): each document id gets a 32x32 grayscale image with pixel
    (y, x) = (13*id + 5*x + 3*y) mod 256 — arbitrary content, because
    the encoder's final LOSSLESS differential frame (SOF7) makes the
    whole pyramid exact regardless of the lossy levels under it.
    doc_id % 2 alternates the base frame mode (DCT SOF0 vs lossless
    SOF3) and doc_id % 3 picks 2- vs 3-level pyramids (3-level adds a
    lossy SOF5 DCT-differential intermediate), so the DHP walk, the EXP
    doubling filter, zero-prediction differential DC, and the
    residual-composition order all sit under the closed-form pixel-sum
    oracle through the production ``decode_media`` dispatch.

    Scale shape: partition-local mapInPandas; image bytes never shuffle.
    Ref parity: the reference has no image codecs (extension surface)."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.jpeg_hier import encode_jpeg_hierarchical
    from evolution_spark.operators.multimodal import decode_media

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 24
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                yy, xx = np.mgrid[0:32, 0:32]
                img = ((13 * i + 5 * xx + 3 * yy) % 256).astype(np.uint8)
                payload = encode_jpeg_hierarchical(
                    img,
                    levels=3 if i % 3 == 0 else 2,
                    dct_base=i % 2 == 0,
                )
                flat = decode_media(payload, "image")
                s = int(np.sum(flat.astype(np.int64)))
                rows.append((i, 32, 32, s, s / flat.size))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height",
                         "pixel_sum", "mean_px"],
            )

    return d.mapInPandas(
        gen,
        "media_id long, width int, height int, pixel_sum long, mean_px double",
    )


@query(
    "multimodal_flac_features",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 24),
    ch1 AS (
      SELECT doc_id,
             SUM((11 * doc_id + 7 * i.v) % 2001 - 1000) AS s1,
             COUNT(*) AS n
      FROM ids CROSS JOIN (SELECT UNNEST(range(1500)) AS v) i
      GROUP BY doc_id
    ),
    ch2 AS (
      SELECT doc_id,
             SUM((5 * doc_id + 3 * i.v) % 1001 - 500) AS s2
      FROM ids CROSS JOIN (SELECT UNNEST(range(1500)) AS v) i
      GROUP BY doc_id
    )
    SELECT ch1.doc_id AS media_id,
           CAST(ch1.n AS BIGINT) AS n_samples,
           CAST(2 AS INT) AS channels,
           CAST(ch1.s1 + ch2.s2 AS BIGINT) AS sample_sum,
           CAST(ch1.s1 - ch2.s2 AS BIGINT) AS side_sum
    FROM ch1 JOIN ch2 ON ch1.doc_id = ch2.doc_id
    """,
)
def multimodal_flac_features(spark, sf_dir):
    """FLAC audio codec end-to-end (RFC 9639 — round 11): each document
    id gets a deterministic 1500-sample STEREO signal (channel 1:
    (11*id + 7*i) mod 2001 - 1000; channel 2: (5*id + 3*i) mod 1001 -
    500), FLAC-encoded with the stereo decorrelation mode rotating by
    doc_id (independent / left-side / right-side / mid-side) and
    block_size=512 so every stream spans multiple frames. Losslessness
    means DuckDB recomputes the exact per-channel sums from the closed
    form — one wrong rice decision, LPC shift, channel reconstruction,
    or CRC handling anywhere shifts sample_sum/side_sum and fails the
    hash. Decode goes through the production ``decode_media``
    magic-byte dispatch.

    Scale shape: partition-local mapInPandas; audio bytes never shuffle.
    Ref parity: the reference has no audio codecs (extension surface)."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.flac import encode_flac
    from evolution_spark.operators.multimodal import decode_media

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 24
    )
    modes = ["independent", "left-side", "right-side", "mid-side"]

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                idx = np.arange(1500)
                c1 = (11 * i + 7 * idx) % 2001 - 1000
                c2 = (5 * i + 3 * idx) % 1001 - 500
                sig = np.stack([c1, c2], axis=1)
                payload = encode_flac(
                    sig, rate=16000, block_size=512,
                    stereo_method=modes[i % 4],
                )
                flat = decode_media(payload, "audio").astype(np.int64)
                st = flat.reshape(-1, 2)
                rows.append((
                    i, st.shape[0], 2,
                    int(st[:, 0].sum() + st[:, 1].sum()),
                    int(st[:, 0].sum() - st[:, 1].sum()),
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_samples", "channels",
                         "sample_sum", "side_sum"],
            )

    return d.mapInPandas(
        gen,
        "media_id long, n_samples long, channels int, "
        "sample_sum long, side_sum long",
    )


@query(
    "multimodal_gif_frames",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 20),
    picks(frame_idx, f) AS (VALUES (0, 0), (1, 2), (2, 5)),
    px AS (
      SELECT doc_id, frame_idx,
             3 * (((7 * doc_id + 11 * f + 3 * x.v + 5 * y.v) % 5) * 60)
               AS v
      FROM ids
      CROSS JOIN picks
      CROSS JOIN (SELECT UNNEST(range(16)) AS v) x
      CROSS JOIN (SELECT UNNEST(range(16)) AS v) y
    )
    SELECT doc_id AS media_id, frame_idx,
           CAST(SUM(v) AS BIGINT) AS pixel_sum
    FROM px GROUP BY doc_id, frame_idx
    """,
)
def multimodal_gif_frames(spark, sf_dir):
    """ANIMATED GIF decode + frame sampling (round 11): each document id
    gets a 6-frame 16x16 animation whose frame f pixel (y, x) is the
    gray triplet ((7*id + 11*f + 3*x + 5*y) mod 5) * 60, GIF-encoded
    (palette LZW — lossless) with interlacing on every other doc, then
    3 frames sampled EVENLY across the timeline (indices 0/2/5, the
    same linspace rule ``sample_frames`` uses). DuckDB recomputes the
    exact per-frame pixel sums from the closed form — one wrong LZW
    code width, interlace row, palette index, or frame pick shifts
    pixel_sum and fails the hash.

    Scale shape: partition-local mapInPandas; media bytes never
    shuffle. Ref parity: the reference has no codecs (extension
    surface)."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.gif import decode_gif, encode_gif

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 20
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                yy, xx = np.mgrid[0:16, 0:16]
                anim = np.stack([
                    np.repeat(
                        (((7 * i + 11 * f + 3 * xx + 5 * yy) % 5) * 60)
                        .astype(np.uint8)[..., None],
                        3, axis=-1,
                    )
                    for f in range(6)
                ])
                payload = encode_gif(anim, interlace=i % 2 == 1)
                frames, _delays = decode_gif(payload)
                picks = np.unique(
                    np.linspace(0, frames.shape[0] - 1, 3).round()
                    .astype(int)
                )
                for fi, p in enumerate(picks):
                    rows.append((
                        i, fi, int(frames[p].astype(np.int64).sum()),
                    ))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "pixel_sum"]
            )

    return d.mapInPandas(
        gen, "media_id long, frame_idx int, pixel_sum long"
    )


@query(
    "multimodal_tiff_features",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 18),
    pages(page_idx) AS (VALUES (0), (1)),
    px AS (
      SELECT doc_id, page_idx,
             (9 * doc_id + 17 * page_idx + 5 * x.v + 7 * y.v) % 256 AS v
      FROM ids
      CROSS JOIN pages
      CROSS JOIN (SELECT UNNEST(range(24)) AS v) x
      CROSS JOIN (SELECT UNNEST(range(20)) AS v) y
    )
    SELECT doc_id AS media_id, page_idx,
           CAST(SUM(v) AS BIGINT) AS pixel_sum
    FROM px GROUP BY doc_id, page_idx
    """,
)
def multimodal_tiff_features(spark, sf_dir):
    """TIFF decode end-to-end (TIFF 6.0 baseline+LZW — round 11): each
    document id gets a TWO-PAGE grayscale TIFF whose page p pixel (y, x)
    is (9*id + 17*p + 5*x + 7*y) mod 256 (arbitrary content — TIFF is
    lossless), with the compression rotating by doc_id (none / LZW /
    PackBits; odd ids add the horizontal-differencing predictor) and
    rows_per_strip=7 so strips never align with page height. DuckDB
    recomputes the exact per-page pixel sums from the closed form — one
    wrong LZW early-change width, PackBits run, predictor column, strip
    boundary, or IFD offset shifts pixel_sum and fails the hash.

    Scale shape: partition-local mapInPandas; image bytes never
    shuffle. Ref parity: the reference has no codecs (extension
    surface)."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.tiff import (
        decode_tiff_pages,
        encode_tiff,
    )

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 18
    )
    comps = ["none", "lzw", "packbits"]

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                yy, xx = np.mgrid[0:20, 0:24]
                pages = [
                    ((9 * i + 17 * p + 5 * xx + 7 * yy) % 256)
                    .astype(np.uint8)
                    for p in range(2)
                ]
                payload = encode_tiff(
                    pages, compression=comps[i % 3],
                    predictor=i % 2 == 1, rows_per_strip=7,
                )
                for p, page in enumerate(decode_tiff_pages(payload)):
                    rows.append((
                        i, p, int(page.astype(np.int64).sum()),
                    ))
            yield pd.DataFrame(
                rows, columns=["media_id", "page_idx", "pixel_sum"]
            )

    return d.mapInPandas(
        gen, "media_id long, page_idx int, pixel_sum long"
    )


def _neardup_tiles(i: int, shift: int = 0):
    """Constant-8x8-tile test image shared by the cross-format query AND
    its locally-computed oracle (one definition — the two must stay in
    lockstep, review r11 pass 8). Constant tiles survive the lossy JPEG
    pipeline exactly."""
    import numpy as np

    img = np.zeros((24, 32), dtype=np.uint8)
    for by in range(3):
        for bx in range(4):
            img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = (
                2 * ((3 * i + 5 * bx + 7 * by) % 124) + shift
            )
    return np.repeat(img[..., None], 3, axis=-1)


def _neardup_encoders():
    from evolution_spark.operators.gif import encode_gif
    from evolution_spark.operators.multimodal import encode_bmp, encode_png
    from evolution_spark.operators.tiff import encode_tiff

    return [
        encode_bmp,
        encode_png,
        lambda px: encode_tiff(px, compression="lzw"),
        encode_gif,
    ]


def _cross_format_neardup_oracle() -> str:
    """Closed-form oracle for multimodal_cross_format_neardup: payloads
    are pure functions of doc_id (0..35 exist at every sf), so the full
    expected near-dup pair list is computable locally with the same
    straight-line codecs the distributed pipeline batches — ALL pairs
    popcount-checked, coincidental near-dups included."""
    from evolution_spark.operators.jpeg_arith import encode_jpeg_arithmetic
    from evolution_spark.operators.multimodal import dhash_bits
    from evolution_spark.operators.tiff import encode_tiff

    tiles = _neardup_tiles
    encoders = _neardup_encoders()
    hashes: dict[int, int] = {}
    for i in range(36):
        px = tiles(i)
        hashes[i] = dhash_bits(encoders[i % 4](px))
        if i % 6 == 0:  # constant tiles -> the JPEG re-save is EXACT
            hashes[i + 100000] = dhash_bits(
                encode_jpeg_arithmetic(px, quality=50)
            )
        if i % 9 == 0:  # brightness shift -> dHash-invariant
            hashes[i + 200000] = dhash_bits(
                encode_tiff(tiles(i, shift=4), compression="packbits")
            )
    ids = sorted(hashes)
    rows = []
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            hm = bin((hashes[a] ^ hashes[b]) & (2**64 - 1)).count("1")
            if hm <= 3:
                rows.append(f"({a}, {b}, {hm})")
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(id_a, id_b, hamming) ORDER BY id_a, id_b"
    )


@query("multimodal_cross_format_neardup", oracle=_cross_format_neardup_oracle())
def multimodal_cross_format_neardup(spark, sf_dir):
    """CROSS-FORMAT perceptual dedup (round 11): the same pixels stored
    as BMP / PNG / TIFF-LZW / GIF (rotating per doc) hash IDENTICALLY
    under dHash because the hash decodes every supported container;
    every 6th document plants an arithmetic-JPEG re-save (constant 8x8
    tiles survive the lossy pipeline exactly, so it collides at hamming
    0) and every 9th a +4-brightness PackBits-TIFF copy (dHash is
    brightness-invariant). This is THE scraped-corpus near-dup shape —
    the same image re-encoded through a different codec — and raw-byte
    dedup misses every planted pair by construction.

    Oracle: closed-form VALUES list computed locally from the same pure
    payload functions (all pairs popcount-checked). Scale shape: hashing
    is partition-local mapInPandas (payloads never shuffle; 8-byte
    hashes do); candidates come from 16-bit band equality self-joins —
    no all-pairs."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.multimodal import (
        dhash_images,
        dhash_near_dups,
    )

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 36
    )

    def gen(batches):
        from evolution_spark.operators.jpeg_arith import (
            encode_jpeg_arithmetic,
        )
        from evolution_spark.operators.tiff import encode_tiff
        from evolution_spark.queries.quality import (
            _neardup_encoders,
            _neardup_tiles,
        )

        tiles = _neardup_tiles
        encoders = _neardup_encoders()
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf["doc_id"]:
                i = int(i)
                px = tiles(i)
                ids.append(i)
                payloads.append(encoders[i % 4](px))
                if i % 6 == 0:
                    ids.append(i + 100000)
                    payloads.append(encode_jpeg_arithmetic(px, quality=50))
                if i % 9 == 0:
                    ids.append(i + 200000)
                    payloads.append(
                        encode_tiff(tiles(i, shift=4),
                                    compression="packbits")
                    )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = d.mapInPandas(gen, "media_id BIGINT, payload BINARY")
    hashes = dhash_images(media, fake=False)
    return dhash_near_dups(hashes, max_hamming=3).orderBy("id_a", "id_b")


@query(
    "multimodal_mp3_metadata",
    oracle="""
    WITH ids AS (SELECT doc_id AS i FROM documents WHERE doc_id < 24),
    params AS (
      SELECT i,
             CASE i % 3 WHEN 0 THEN '1' WHEN 1 THEN '2' ELSE '2.5' END
               AS version,
             CASE WHEN i % 5 = 4 THEN 2 ELSE 3 END AS layer,
             (i // 3) % 3 AS sr_idx,
             8 + (i % 5) AS n_frames,
             i % 4 AS mode,
             i % 2 = 1 AS is_vbr
      FROM ids
    ),
    rates(version, sr_idx, rate) AS (VALUES
      ('1', 0, 44100), ('1', 1, 48000), ('1', 2, 32000),
      ('2', 0, 22050), ('2', 1, 24000), ('2', 2, 16000),
      ('2.5', 0, 11025), ('2.5', 1, 12000), ('2.5', 2, 8000)),
    spf AS (
      SELECT i, CASE WHEN layer = 2 THEN 1152
                     WHEN version = '1' THEN 1152 ELSE 576 END AS v
      FROM params
    ),
    perframe AS (
      SELECT p.i,
             list_extract(
               CASE WHEN p.version = '1' AND p.layer = 3 THEN
                 [0,32,40,48,56,64,80,96,112,128,160,192,224,256,320]
               WHEN p.version = '1' AND p.layer = 2 THEN
                 [0,32,48,56,64,80,96,112,128,160,192,224,256,320,384]
               ELSE
                 [0,8,16,24,32,40,48,56,64,80,96,112,128,144,160]
               END,
               CASE WHEN p.is_vbr THEN 2 + ((p.i + f.v) % 8)
                    ELSE 10 END) AS kbps
      FROM params p
      CROSS JOIN (SELECT UNNEST(range(13)) AS v) f
      WHERE f.v < p.n_frames
    )
    SELECT p.i AS media_id, p.version, p.layer,
           r.rate AS sample_rate,
           CASE WHEN p.mode = 3 THEN 1 ELSE 2 END AS channels,
           CAST(p.n_frames AS BIGINT) AS n_frames,
           CAST(p.n_frames * s.v * 1000000 // r.rate AS BIGINT)
             AS duration_us,
           CAST(SUM(pf.kbps) AS BIGINT) AS br_sum,
           CAST(MIN(pf.kbps) AS INT) AS br_min,
           CAST(MAX(pf.kbps) AS INT) AS br_max,
           p.is_vbr AS vbr,
           p.i % 6 = 0 AS has_xing,
           CAST(CASE WHEN p.i % 6 = 0 THEN p.n_frames END AS BIGINT)
             AS xing_frames,
           p.i % 3 = 0 AS has_id3v2,
           p.i % 4 = 2 AS has_id3v1
    FROM params p
    JOIN rates r ON r.version = p.version AND r.sr_idx = p.sr_idx
    JOIN spf s ON s.i = p.i
    JOIN perframe pf ON pf.i = p.i
    GROUP BY ALL
    """,
)
def multimodal_mp3_metadata(spark, sf_dir):
    """MP3 frame-header metadata walk (round 12, verdict item 3): each
    document id gets a structurally valid MPEG-audio stream — version
    rotating 1/2/2.5, Layer III (Layer II every 5th id), sample-rate
    index (id//3)%3, 8..12 frames with the padding bit alternating, VBR
    on odd ids (per-frame bitrate index 1+((id+f)%8), CBR index 9
    otherwise), channel mode id%4, an ID3v2 prefix every 3rd id, an
    ID3v1 tail every 4th-plus-2, and a Xing tag every 6th — then
    ``parse_mp3_metadata`` (ISO 11172-3 / 13818-3 header layout) walks
    the frames and reports exact duration/bitrate totals. DuckDB
    recomputes every column closed-form from the same parameter
    derivation, including the version/layer bitrate tables — one wrong
    table entry, frame-length slot, samples-per-frame (576 vs 1152 on
    LSF Layer III), padding byte, or tag skip shifts the walk and fails
    the hash. PCM synthesis stays a declared refusal in
    ``decode_media``; this is the metadata curation path.

    Scale shape: partition-local mapInPandas, audio bytes never
    shuffle. Ref parity: the reference has no media handling
    (extension surface)."""
    import pandas as pd

    from evolution_spark.operators.mp3 import build_mp3, parse_mp3_metadata

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 24
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                version = ["1", "2", "2.5"][i % 3]
                layer = 2 if i % 5 == 4 else 3
                n_frames = 8 + (i % 5)
                if i % 2 == 1:
                    idxs = [1 + ((i + f) % 8) for f in range(n_frames)]
                else:
                    idxs = 9
                payload = build_mp3(
                    n_frames,
                    version=version,
                    layer=layer,
                    bitrate_indices=idxs,
                    sr_idx=(i // 3) % 3,
                    mode=i % 4,
                    pad_alternate=True,
                    id3v2=bytes(40 + i) if i % 3 == 0 else None,
                    id3v1=i % 4 == 2,
                    xing=i % 6 == 0,
                    seed=i,
                )
                m = parse_mp3_metadata(payload)
                rows.append((
                    i, m["version"], m["layer"], m["sample_rate"],
                    m["channels"], m["n_frames"], m["duration_us"],
                    m["bitrate_kbps_sum"], m["bitrate_kbps_min"],
                    m["bitrate_kbps_max"], m["vbr"], m["has_xing"],
                    m["xing_frames"], m["has_id3v2"], m["has_id3v1"],
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "version", "layer", "sample_rate",
                         "channels", "n_frames", "duration_us", "br_sum",
                         "br_min", "br_max", "vbr", "has_xing",
                         "xing_frames", "has_id3v2", "has_id3v1"],
            )

    return d.mapInPandas(
        gen,
        "media_id long, version string, layer int, sample_rate int, "
        "channels int, n_frames long, duration_us long, br_sum long, "
        "br_min int, br_max int, vbr boolean, has_xing boolean, "
        "xing_frames long, has_id3v2 boolean, has_id3v1 boolean",
    )


@query(
    "multimodal_mp4_metadata",
    oracle="""
    WITH ids AS (SELECT doc_id AS i FROM documents WHERE doc_id < 24),
    params AS (
      SELECT i,
             10 + (i % 6) AS n,
             2 + (i % 3) AS k,
             64 + 16 * (i % 4) AS width,
             48 + 16 * (i % 3) AS height,
             i % 2 = 0 AS has_audio,
             20 + i AS na,
             list_extract([16000, 22050, 32000], 1 + (i // 2) % 3)
               AS arate,
             1 + ((i // 4) % 2) AS achannels
      FROM ids
    ),
    kf AS (
      SELECT p.i, p.k, f.v AS j
      FROM params p CROSS JOIN (SELECT UNNEST(range(16)) AS v) f
      WHERE f.v < p.n AND f.v % p.k = 0
    ),
    pre AS (
      SELECT kf.i, kf.j,
             COALESCE(SUM(100 + ((kf.i + t.v) % 7) * 10), 0) AS prefix
      FROM kf LEFT JOIN (SELECT UNNEST(range(16)) AS v) t ON t.v < kf.j
      GROUP BY kf.i, kf.j
    ),
    kagg AS (
      SELECT pre.i,
             COUNT(*) AS n_kf,
             SUM(pre.prefix) AS kf_rel_sum,
             SUM(100 + ((pre.i + pre.j) % 7) * 10) AS kf_size_sum
      FROM pre GROUP BY pre.i
    )
    SELECT p.i AS media_id,
           'isom' AS brand,
           CAST(CASE WHEN p.has_audio
                THEN GREATEST(p.n * 100 * 1000 // 600,
                              p.na * 256 * 1000 // p.arate)
                ELSE p.n * 100 * 1000 // 600 END * 1000 AS BIGINT)
             AS movie_duration_us,
           CAST(CASE WHEN p.has_audio THEN 2 ELSE 1 END AS INT)
             AS n_tracks,
           'avc1' AS v_codec,
           CAST(p.width AS INT) AS width,
           CAST(p.height AS INT) AS height,
           CAST(p.n AS BIGINT) AS v_n_samples,
           CAST(p.n * 100 * 1000000 // 600 AS BIGINT) AS v_duration_us,
           CAST(k.n_kf AS BIGINT) AS n_keyframes,
           CAST(k.kf_rel_sum AS BIGINT) AS kf_rel_sum,
           CAST(k.kf_size_sum AS BIGINT) AS kf_size_sum,
           CAST(CASE WHEN p.has_audio THEN p.na END AS BIGINT)
             AS a_n_samples,
           CAST(CASE WHEN p.has_audio THEN p.arate END AS INT)
             AS a_sample_rate,
           CAST(CASE WHEN p.has_audio THEN p.achannels END AS INT)
             AS a_channels,
           CAST(CASE WHEN p.has_audio
                THEN p.na * 256 * 1000000 // p.arate END AS BIGINT)
             AS a_duration_us
    FROM params p JOIN kagg k ON k.i = p.i
    """,
)
def multimodal_mp4_metadata(spark, sf_dir):
    """MP4/ISO-BMFF container metadata + keyframe byte index (round 12,
    verdict item 4): each document id gets a spec-shaped container —
    10..15 video samples with deterministic per-sample sizes
    100+((id+f)%7)*10 packed 3..5 per chunk (exercising the partial
    last chunk), keyframes every 2..4 samples via stss, resolution
    rotating, and on even ids a second all-sync mp4a audio track whose
    chunks follow the video bytes — then ``parse_mp4_metadata`` +
    ``keyframe_index`` (ISO 14496-12 box walk) reconstruct every fact.
    The keyframe columns are the strong check: ``kf_rel_sum`` is the
    sum of keyframe byte offsets relative to the first sample, which is
    only right if the stsc run expansion, stsz prefix sums, and stco
    chunk bases all compose exactly; DuckDB recomputes it closed-form.
    Codec bitstream decode stays a declared refusal in ``decode_media``.

    Scale shape: partition-local mapInPandas, container bytes never
    shuffle; at corpus scale the keyframe index is what a frame sampler
    range-reads instead of fetching whole files. Ref parity: the
    reference has no media handling (extension surface)."""
    import pandas as pd

    from evolution_spark.operators.mp4 import (
        build_mp4,
        keyframe_index,
        parse_mp4_metadata,
    )

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 24
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                n = 10 + (i % 6)
                sizes = [100 + ((i + f) % 7) * 10 for f in range(n)]
                audio = None
                if i % 2 == 0:
                    audio = {
                        "n": 20 + i,
                        "rate": [16000, 22050, 32000][(i // 2) % 3],
                        "channels": 1 + ((i // 4) % 2),
                        "size": 64,
                    }
                payload = build_mp4(
                    sizes,
                    keyframe_every=2 + (i % 3),
                    samples_per_chunk=3 + (i % 3),
                    width=64 + 16 * (i % 4),
                    height=48 + 16 * (i % 3),
                    audio=audio,
                    seed=i,
                )
                m = parse_mp4_metadata(payload)
                (kfs,) = keyframe_index(payload)
                base = kfs[0][1]
                v = m["tracks"][0]
                a = m["tracks"][1] if len(m["tracks"]) > 1 else None
                rows.append((
                    i, m["brand"], m["duration_us"], m["n_tracks"],
                    v["codec"], v["width"], v["height"], v["n_samples"],
                    v["duration_us"], len(kfs),
                    sum(off - base for _, off, _ in kfs),
                    sum(sz for _, _, sz in kfs),
                    a["n_samples"] if a else None,
                    a["sample_rate"] if a else None,
                    a["channels"] if a else None,
                    a["duration_us"] if a else None,
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "brand", "movie_duration_us",
                         "n_tracks", "v_codec", "width", "height",
                         "v_n_samples", "v_duration_us", "n_keyframes",
                         "kf_rel_sum", "kf_size_sum", "a_n_samples",
                         "a_sample_rate", "a_channels", "a_duration_us"],
            )

    return d.mapInPandas(
        gen,
        "media_id long, brand string, movie_duration_us long, "
        "n_tracks int, v_codec string, width int, height int, "
        "v_n_samples long, v_duration_us long, n_keyframes long, "
        "kf_rel_sum long, kf_size_sum long, a_n_samples long, "
        "a_sample_rate int, a_channels int, a_duration_us long",
    )


@query(
    "multimodal_png16_tiled_tiff",
    oracle="""
    WITH ids AS (SELECT doc_id AS i FROM documents WHERE doc_id < 24),
    png AS (
      SELECT i, SUM((i * 31 + x.v * 7 + y.v * 13) % 65536) AS s
      FROM ids
      CROSS JOIN (SELECT UNNEST(range(24)) AS v) x
      CROSS JOIN (SELECT UNNEST(range(16)) AS v) y
      GROUP BY i
    ),
    tif AS (
      SELECT i, SUM((i + 3 * x.v + 5 * y.v + 11 * c.v) % 256) AS s
      FROM ids
      CROSS JOIN (SELECT UNNEST(range(40)) AS v) x
      CROSS JOIN (SELECT UNNEST(range(24)) AS v) y
      CROSS JOIN (SELECT UNNEST(range(3)) AS v) c
      GROUP BY i
    )
    SELECT png.i AS media_id,
           CAST(png.s AS BIGINT) AS png16_sum,
           CAST(tif.s AS BIGINT) AS tiff_tiled_sum
    FROM png JOIN tif ON png.i = tif.i
    """,
)
def multimodal_png16_tiled_tiff(spark, sf_dir):
    """Round-12 refusal lifts, oracle-checked end-to-end: each document
    id gets (a) a 16-BIT grayscale PNG (24x16, sample (x,y) =
    (31*id + 7*x + 13*y) mod 65536 — full 16-bit range, big-endian
    samples, filter type rotating by id to exercise byte-level
    filtering at bpp=2) and (b) a TILED RGB TIFF (40x24, 16x16 tiles —
    a 3x2 grid with right AND bottom zero-padded edge tiles — LZW +
    predictor, channel value (id + 3x + 5y + 11c) mod 256). DuckDB
    recomputes both pixel sums closed-form: one wrong filter offset,
    sample byte order, tile placement, pad handling, or per-tile-row
    predictor reset shifts a sum and fails the hash. Decode goes
    through the production ``decode_media`` dispatch.

    Scale shape: partition-local mapInPandas; media bytes never
    shuffle. Ref parity: the reference has no codecs (extension
    surface)."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.multimodal import (
        decode_media,
        encode_png,
    )
    from evolution_spark.operators.tiff import encode_tiff

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 24
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                yy, xx = np.meshgrid(
                    np.arange(16), np.arange(24), indexing="ij"
                )
                png_px = ((i * 31 + xx * 7 + yy * 13) % 65536).astype(
                    np.uint16
                )
                png_payload = encode_png(png_px, filter_type=i % 5)
                png_sum = int(
                    decode_media(png_payload, "image").astype(np.int64).sum()
                )
                cy, cx = np.meshgrid(
                    np.arange(24), np.arange(40), indexing="ij"
                )
                rgb = np.stack(
                    [(i + 3 * cx + 5 * cy + 11 * c) % 256 for c in range(3)],
                    axis=-1,
                ).astype(np.uint8)
                tif_payload = encode_tiff(
                    rgb, compression="lzw", predictor=True,
                    tile_size=(16, 16),
                )
                tif_sum = int(
                    decode_media(tif_payload, "image").astype(np.int64).sum()
                )
                rows.append((i, png_sum, tif_sum))
            yield pd.DataFrame(
                rows, columns=["media_id", "png16_sum", "tiff_tiled_sum"]
            )

    return d.mapInPandas(
        gen, "media_id long, png16_sum long, tiff_tiled_sum long"
    )


@query(
    "multimodal_webm_metadata",
    oracle="""
    WITH ids AS (SELECT doc_id AS i FROM documents WHERE doc_id < 24),
    params AS (
      SELECT i,
             1000 + 250 * i AS dur_ticks,
             CASE WHEN i % 2 = 0 THEN 1000 ELSE 500 END AS scale_us,
             3 + (i % 3) AS k,
             50 + 10 * (i % 4) AS cb,
             i % 3 <> 2 AS has_audio
      FROM ids
    )
    SELECT i AS media_id,
           'webm' AS doctype,
           CAST(dur_ticks * scale_us AS BIGINT) AS duration_us,
           CAST(CASE WHEN has_audio THEN 2 ELSE 1 END AS INT) AS n_tracks,
           list_extract(['V_VP9', 'V_VP8', 'V_AV1'], 1 + i % 3)
             AS v_codec,
           CAST(160 + 16 * (i % 5) AS INT) AS width,
           CAST(90 + 16 * (i % 4) AS INT) AS height,
           CAST(CASE WHEN has_audio THEN
                list_extract([16000, 24000, 48000], 1 + (i // 3) % 3)
                END AS INT) AS a_rate,
           CAST(CASE WHEN has_audio THEN 1 + i % 2 END AS INT)
             AS a_channels,
           CAST(k AS BIGINT) AS n_cues,
           CAST(500 * k * (k - 1) / 2 AS BIGINT) AS cue_time_sum,
           CAST((k - 1) * (cb + 5) AS BIGINT) AS cue_off_span
    FROM params
    """,
)
def multimodal_webm_metadata(spark, sf_dir):
    """WebM/Matroska EBML container metadata + cue index (round 12,
    the video-container sibling of ``multimodal_mp4_metadata``): each
    document id gets a spec-shaped EBML container — duration
    1000+250*id ticks at a TimestampScale alternating 1 ms / 0.5 ms
    per tick (exercising the scale math), a VP9/VP8/AV1 video track
    with rotating resolution, an Opus audio track on two of three ids,
    and 3..5 CuePoints each pointing at a REAL cluster byte offset —
    then ``parse_webm_metadata`` + ``cue_index`` (RFC 8794 VINT walk)
    reconstruct every fact. ``cue_off_span`` pins the byte ARITHMETIC:
    consecutive cluster offsets differ by exactly cluster_bytes + 5
    (4-byte Cluster id + 1-byte size VINT), which DuckDB recomputes
    closed-form — one wrong VINT marker bit, element size, or offset
    base shifts it. Codec bitstream decode stays a declared refusal in
    ``decode_media``.

    Scale shape: partition-local mapInPandas; container bytes never
    shuffle. Ref parity: the reference has no media handling
    (extension surface)."""
    import pandas as pd

    from evolution_spark.operators.webm import (
        build_webm,
        cue_index,
        parse_webm_metadata,
    )

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 24
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                k = 3 + (i % 3)
                audio = None
                if i % 3 != 2:
                    audio = {
                        "rate": [16000, 24000, 48000][(i // 3) % 3],
                        "channels": 1 + i % 2,
                        "codec": "A_OPUS",
                    }
                payload = build_webm(
                    duration_ticks=float(1000 + 250 * i),
                    video={
                        "width": 160 + 16 * (i % 5),
                        "height": 90 + 16 * (i % 4),
                        "codec": ["V_VP9", "V_VP8", "V_AV1"][i % 3],
                    },
                    audio=audio,
                    cue_times=tuple(j * 500 for j in range(k)),
                    n_clusters=k,
                    cluster_bytes=50 + 10 * (i % 4),
                    timestamp_scale_ns=(
                        1_000_000 if i % 2 == 0 else 500_000
                    ),
                    seed=i,
                )
                m = parse_webm_metadata(payload)
                cues = cue_index(payload)
                v = m["tracks"][0]
                a = m["tracks"][1] if len(m["tracks"]) > 1 else None
                rows.append((
                    i, m["doctype"], m["duration_us"], m["n_tracks"],
                    v["codec_id"], v["width"], v["height"],
                    a["sample_rate"] if a else None,
                    a["channels"] if a else None,
                    len(cues),
                    sum(c[0] for c in cues),
                    cues[-1][2] - cues[0][2],
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "doctype", "duration_us", "n_tracks",
                         "v_codec", "width", "height", "a_rate",
                         "a_channels", "n_cues", "cue_time_sum",
                         "cue_off_span"],
            )

    return d.mapInPandas(
        gen,
        "media_id long, doctype string, duration_us long, n_tracks int, "
        "v_codec string, width int, height int, a_rate int, "
        "a_channels int, n_cues long, cue_time_sum long, "
        "cue_off_span long",
    )


@query(
    "multimodal_ogg_metadata",
    oracle="""
    WITH ids AS (SELECT doc_id AS i FROM documents WHERE doc_id < 24),
    params AS (
      SELECT i,
             i % 2 = 0 AS is_vorbis,
             list_extract([8000, 16000, 44100, 48000], 1 + (i // 2) % 4)
               AS v_rate,
             list_extract([16000, 24000, 48000], 1 + (i // 2) % 3)
               AS o_rate,
             1 + i % 2 AS channels,
             3 + i % 3 AS n_audio
      FROM ids
    ),
    calc AS (
      SELECT i, is_vorbis, channels, n_audio,
             CASE WHEN is_vorbis THEN v_rate ELSE o_rate END AS rate,
             CASE WHEN is_vorbis THEN 0 ELSE 120 + i END AS pre_skip,
             CASE WHEN is_vorbis THEN v_rate * (1 + i % 3) + 50 * i
                  ELSE 48000 * (1 + i % 2) + 100 * i END AS total,
             CASE WHEN is_vorbis THEN v_rate ELSE 48000 END AS gr
      FROM params
    )
    SELECT i AS media_id,
           CASE WHEN is_vorbis THEN 'vorbis' ELSE 'opus' END AS codec,
           CAST(channels AS INT) AS channels,
           CAST(rate AS INT) AS sample_rate,
           CAST(pre_skip AS INT) AS pre_skip,
           CAST(2 + n_audio AS BIGINT) AS n_pages,
           CAST(total AS BIGINT) AS total_samples,
           CAST(total * 1000000 // gr AS BIGINT) AS duration_us
    FROM calc
    """,
)
def multimodal_ogg_metadata(spark, sf_dir):
    """OGG container metadata (round 12 — the last common audio
    container after WAV/FLAC/MP3): each document id gets a spec-shaped
    single-stream OGG — Vorbis on even ids (granule rate = stream
    rate), Opus on odd (granules ALWAYS at 48 kHz with a per-id
    pre-skip, RFC 7845 §4 — the two rules real tools get wrong), 3..5
    audio pages with real RFC 3533 CRC-32s — then ``parse_ogg_metadata``
    walks every page and reports exact duration from the last granule.
    DuckDB recomputes every column closed-form; one wrong granule-rate
    pick, pre-skip subtraction, lacing sum, or CRC table entry shifts a
    value and fails the hash. Audio decode stays a declared refusal in
    ``decode_media``.

    Scale shape: partition-local mapInPandas; container bytes never
    shuffle. Ref parity: the reference has no media handling
    (extension surface)."""
    import pandas as pd

    from evolution_spark.operators.ogg import build_ogg, parse_ogg_metadata

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 24
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                if i % 2 == 0:
                    codec = "vorbis"
                    rate = [8000, 16000, 44100, 48000][(i // 2) % 4]
                    total = rate * (1 + i % 3) + 50 * i
                    pre_skip = 0
                else:
                    codec = "opus"
                    rate = [16000, 24000, 48000][(i // 2) % 3]
                    total = 48000 * (1 + i % 2) + 100 * i
                    pre_skip = 120 + i
                payload = build_ogg(
                    codec, total_samples=total, rate=rate,
                    channels=1 + i % 2, pre_skip=pre_skip,
                    n_audio_pages=3 + i % 3, seed=i,
                )
                m = parse_ogg_metadata(payload)
                rows.append((
                    i, m["codec"], m["channels"], m["sample_rate"],
                    m["pre_skip"], m["n_pages"], m["total_samples"],
                    m["duration_us"],
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "codec", "channels", "sample_rate",
                         "pre_skip", "n_pages", "total_samples",
                         "duration_us"],
            )

    return d.mapInPandas(
        gen,
        "media_id long, codec string, channels int, sample_rate int, "
        "pre_skip int, n_pages long, total_samples long, duration_us long",
    )


@query(
    "multimodal_keyframe_ranges",
    oracle="""
    WITH ids AS (SELECT doc_id AS i FROM documents WHERE doc_id < 24),
    mp4 AS (
      SELECT i, 10 + (i % 4) AS n, 2 + (i % 3) AS k
      FROM ids WHERE i % 2 = 0
    ),
    mp4_kf AS (
      SELECT m.i,
             CAST(f.v // m.k AS INT) AS frame_idx,
             'mp4' AS container,
             CAST(f.v + 1 AS BIGINT) AS time_ticks,
             CAST((SELECT COALESCE(SUM(100 + ((m.i + t.v) % 7) * 10), 0)
                   FROM (SELECT UNNEST(range(16)) AS v) t
                   WHERE t.v < f.v) AS BIGINT) AS rel_offset,
             CAST(100 + ((m.i + f.v) % 7) * 10 AS BIGINT) AS n_bytes
      FROM mp4 m CROSS JOIN (SELECT UNNEST(range(16)) AS v) f
      WHERE f.v < m.n AND f.v % m.k = 0
    ),
    webm AS (
      SELECT i, 3 + (i % 3) AS kc, 60 + 10 * (i % 3) AS cb
      FROM ids WHERE i % 2 = 1
    ),
    webm_kf AS (
      SELECT w.i,
             CAST(j.v AS INT) AS frame_idx,
             'webm' AS container,
             CAST(j.v * 250 AS BIGINT) AS time_ticks,
             CAST(j.v * (w.cb + 5) AS BIGINT) AS rel_offset,
             CAST(CASE WHEN j.v < w.kc - 1 THEN w.cb + 5 END AS BIGINT)
               AS n_bytes
      FROM webm w CROSS JOIN (SELECT UNNEST(range(8)) AS v) j
      WHERE j.v < w.kc
    )
    SELECT i AS media_id, frame_idx, container, time_ticks,
           rel_offset, n_bytes
    FROM mp4_kf
    UNION ALL
    SELECT i, frame_idx, container, time_ticks, rel_offset, n_bytes
    FROM webm_kf
    """,
)
def multimodal_keyframe_ranges(spark, sf_dir):
    """The distributed video-frame-sampling PLAN, oracle-checked end to
    end (round 12): even document ids get a spec-shaped MP4 (10..13
    samples, keyframes every 2..4 via stss), odd ids a WebM with 3..5
    CuePoints — then ``sample_keyframe_ranges`` (metadata-only, no
    decode) emits the byte ranges a 100 TB frame sampler would
    range-read. Offsets are normalized per media to the first range's
    offset (a window min), making the stsc/stsz/stco and EBML VINT
    arithmetic closed-form for DuckDB: one wrong prefix sum, cue span,
    or tick shifts a row and fails the hash.

    Scale shape: payload bytes never shuffle — only (id, offset, size)
    rows come out of the mapInPandas; the window is per-media-id over
    <=7 rows. Ref parity: the reference has no media handling
    (extension surface)."""
    import pandas as pd
    from pyspark.sql import Window

    from evolution_spark.operators.mp4 import build_mp4
    from evolution_spark.operators.multimodal import sample_keyframe_ranges
    from evolution_spark.operators.webm import build_webm

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 24
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf["doc_id"]:
                i = int(i)
                if i % 2 == 0:
                    n = 10 + (i % 4)
                    payloads.append(build_mp4(
                        [100 + ((i + f) % 7) * 10 for f in range(n)],
                        keyframe_every=2 + (i % 3),
                        samples_per_chunk=3 + (i % 2),
                        seed=i,
                    ))
                else:
                    kc = 3 + (i % 3)
                    payloads.append(build_webm(
                        duration_ticks=float(250 * kc),
                        video={"width": 64, "height": 48},
                        cue_times=tuple(j * 250 for j in range(kc)),
                        n_clusters=kc,
                        cluster_bytes=60 + 10 * (i % 3),
                        seed=i,
                    ))
                ids.append(i)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = d.mapInPandas(gen, "media_id long, payload binary")
    ranges = sample_keyframe_ranges(media, n_frames=10)
    w = Window.partitionBy("media_id")
    return ranges.select(
        "media_id", "frame_idx", "container", "time_ticks",
        (F.col("byte_offset") - F.min("byte_offset").over(w)).alias(
            "rel_offset"
        ),
        "n_bytes",
    )


@query(
    "multimodal_fax_tiff",
    oracle="""
    WITH ids AS (SELECT doc_id AS i FROM documents WHERE doc_id < 24),
    px AS (
      SELECT i,
             CASE WHEN (3 * x.v + 7 * y.v + i) % 11 < 4
                  THEN 0 ELSE 1 END AS white
      FROM ids
      CROSS JOIN (SELECT UNNEST(range(46)) AS v) x
      CROSS JOIN (SELECT UNNEST(range(29)) AS v) y
    )
    SELECT i AS media_id,
           CASE WHEN i % 2 = 0 THEN 'g4' ELSE 'mh' END AS coding,
           CAST(SUM(white) AS BIGINT) AS white_px,
           CAST(COUNT(*) - SUM(white) AS BIGINT) AS black_px
    FROM px GROUP BY i
    """,
)
def multimodal_fax_tiff(spark, sf_dir):
    """CCITT fax TIFF end-to-end (round 12 — the 'different coding
    system' refusal lifted): each document id gets a 46x29 bilevel page
    (black iff (3x+7y+id) mod 11 < 4 — diagonal run texture exercising
    every T.6 mode), G4-coded on even ids and MH-RLE on odd, multi-strip
    (8 rows/strip), then decoded through the production ``decode_media``
    dispatch. DuckDB recomputes the white/black pixel counts
    closed-form — one wrong T.4 table entry, vertical-mode offset, pass
    fill, or photometric flip shifts a count and fails the hash.

    Scale shape: partition-local mapInPandas; scan bytes never shuffle.
    Ref parity: the reference has no codecs (extension surface)."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.multimodal import decode_media
    from evolution_spark.operators.tiff import encode_tiff

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 24
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                yy, xx = np.meshgrid(
                    np.arange(29), np.arange(46), indexing="ij"
                )
                white = ((3 * xx + 7 * yy + i) % 11 >= 4).astype(np.uint8)
                coding = "g4" if i % 2 == 0 else "mh"
                payload = encode_tiff(white, compression=coding,
                                      rows_per_strip=8)
                flat = decode_media(payload, "image").astype(np.int64)
                rows.append((
                    i, coding, int(flat.sum()),
                    int(flat.size - flat.sum()),
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "coding", "white_px", "black_px"],
            )

    return d.mapInPandas(
        gen,
        "media_id long, coding string, white_px long, black_px long",
    )


@query(
    "multimodal_probe_mixed",
    oracle="""
    WITH ids AS (SELECT doc_id AS i FROM documents WHERE doc_id < 30),
    p AS (
      SELECT i, i % 6 AS v,
             8 + i % 3 AS mp4_n,
             500 + 100 * i AS webm_ticks,
             8 + i % 5 AS mp3_n,
             list_extract([44100, 48000, 32000], 1 + (i // 6) % 3)
               AS mp3_rate,
             48000 + 100 * i AS opus_total,
             4000 + 10 * i AS wav_n
      FROM ids
    )
    SELECT i AS media_id,
           CASE v WHEN 0 THEN 'mp4' WHEN 1 THEN 'webm' WHEN 2 THEN 'mp3'
                  WHEN 3 THEN 'ogg' WHEN 4 THEN 'wav' ELSE 'png' END
             AS container,
           CASE WHEN v IN (0, 1) THEN 'video'
                WHEN v = 5 THEN 'image' ELSE 'audio' END AS kind,
           CASE v WHEN 0 THEN 'avc1' WHEN 1 THEN 'V_VP9'
                  WHEN 2 THEN 'mp3_layer3' WHEN 3 THEN 'opus'
                  WHEN 4 THEN 'pcm_s16le' ELSE 'png' END AS codec,
           CAST(CASE v WHEN 0 THEN 64 + 16 * (i % 4)
                       WHEN 1 THEN 160 + 16 * (i % 5)
                       WHEN 5 THEN 20 + (i % 5) END AS INT) AS width,
           CAST(CASE v WHEN 0 THEN 48 WHEN 1 THEN 90
                       WHEN 5 THEN 12 + (i % 3) END AS INT) AS height,
           CAST(CASE v
                WHEN 0 THEN (mp4_n * 100 * 1000 // 600) * 1000
                WHEN 1 THEN webm_ticks * 1000
                WHEN 2 THEN mp3_n * 1152 * 1000000 // mp3_rate
                WHEN 3 THEN opus_total * 1000000 // 48000
                WHEN 4 THEN wav_n * 1000000 // 8000
                END AS BIGINT) AS duration_us,
           CAST(CASE v WHEN 2 THEN mp3_rate WHEN 3 THEN 16000
                       WHEN 4 THEN 8000 END AS INT) AS sample_rate,
           CAST(CASE v WHEN 2 THEN 2 WHEN 3 THEN 1 + i % 2
                       WHEN 4 THEN 2 END AS INT) AS channels
    FROM p
    """,
)
def multimodal_probe_mixed(spark, sf_dir):
    """UNIFIED media probe over a MIXED corpus (round 12 — the curation
    entry point): document ids rotate across all six container families
    (MP4 / WebM / MP3 / OGG-Opus / WAV / PNG) with deterministic
    parameters, then ONE ``probe_media`` pass returns a uniform
    metadata row per payload — container, kind, codec, resolution,
    exact duration, audio params — with no pixel/sample decode for the
    container formats. DuckDB recomputes every column closed-form; a
    wrong dispatch, duration rule (Opus 48 kHz granules, MP3
    samples-per-frame, MP4 movie-timescale math), or header offset
    shifts a value and fails the hash.

    Scale shape: header-only parse in one partition-local mapInPandas;
    this is the pass a 100 TB ingest runs FIRST to route payloads.
    Ref parity: the reference has no media handling (extension
    surface)."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.flac import encode_flac  # noqa: F401
    from evolution_spark.operators.mp3 import build_mp3
    from evolution_spark.operators.mp4 import build_mp4
    from evolution_spark.operators.multimodal import (
        encode_png,
        encode_wav,
        probe_media,
    )
    from evolution_spark.operators.ogg import build_ogg
    from evolution_spark.operators.webm import build_webm

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 30
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf["doc_id"]:
                i = int(i)
                v = i % 6
                if v == 0:
                    pl = build_mp4(
                        [100] * (8 + i % 3), keyframe_every=2,
                        width=64 + 16 * (i % 4), height=48, seed=i,
                    )
                elif v == 1:
                    pl = build_webm(
                        duration_ticks=float(500 + 100 * i),
                        video={"width": 160 + 16 * (i % 5),
                               "height": 90, "codec": "V_VP9"},
                        seed=i,
                    )
                elif v == 2:
                    pl = build_mp3(
                        8 + i % 5, bitrate_indices=9,
                        sr_idx=(i // 6) % 3, mode=0, seed=i,
                    )
                elif v == 3:
                    pl = build_ogg(
                        "opus", total_samples=48000 + 100 * i,
                        rate=16000, channels=1 + i % 2, seed=i,
                    )
                elif v == 4:
                    n = 4000 + 10 * i
                    sig = ((i * 37 + np.arange(n)) % 2001 - 1000)
                    pl = encode_wav(
                        np.stack([sig, sig], axis=1), sample_rate=8000
                    )
                else:
                    img = (
                        (i + np.arange((12 + i % 3) * (20 + i % 5)))
                        % 256
                    ).astype(np.uint8).reshape(12 + i % 3, 20 + i % 5)
                    pl = encode_png(img)
                ids.append(i)
                payloads.append(pl)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = d.mapInPandas(gen, "media_id long, payload binary")
    return probe_media(media).select(
        "media_id", "container", "kind", "codec", "width", "height",
        "duration_us", "sample_rate", "channels",
    )


@query(
    "multimodal_sof11_jpeg_features",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 24),
    px AS (
      SELECT doc_id,
             (doc_id * 7 + x.v * 3 + y.v * 11
              + CASE WHEN (x.v + y.v) % 5 = 0 THEN 97 ELSE 0 END) % 256
               AS v
      FROM ids
      CROSS JOIN (SELECT UNNEST(range(26)) AS v) x
      CROSS JOIN (SELECT UNNEST(range(18)) AS v) y
    )
    SELECT doc_id AS media_id,
           CAST(468 AS BIGINT) AS n_px,
           CAST(SUM(v) AS BIGINT) AS pixel_sum,
           CAST(MAX(v) AS INT) AS max_px
    FROM px GROUP BY doc_id
    """,
)
def multimodal_sof11_jpeg_features(spark, sf_dir):
    """ARITHMETIC LOSSLESS JPEG (SOF11 — round 12, the LAST JPEG mode
    this engine refused): each document id gets a 26x18 gray image
    (pixel (x,y) = (7*id + 3x + 11y + spike) mod 256 — gradient plus a
    diagonal spike lattice exercising the 2-D conditioning contexts),
    SOF11-encoded with the predictor rotating over all seven Annex-H
    selections by id, restart intervals on every 3rd id, and a
    non-default conditioning bound pair on every 4th — then decoded
    through the production ``decode_media`` -> ``decode_jpeg`` SOF
    dispatch. Losslessness means DuckDB recomputes the exact pixel sums
    closed-form; one wrong QM state, context classification, magnitude
    tree offset, or prediction reset shifts a sum and fails the hash.
    (Provenance note in the module: within-repo conformance is total;
    foreign-encoder conformance is unverifiable in this container and
    documented as such.)

    Scale shape: partition-local mapInPandas; image bytes never
    shuffle. Ref parity: the reference has no codecs (extension
    surface)."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.jpeg_lossless_arith import (
        encode_jpeg_lossless_arith,
    )
    from evolution_spark.operators.multimodal import decode_media

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 24
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                yy, xx = np.meshgrid(
                    np.arange(18), np.arange(26), indexing="ij"
                )
                img = ((i * 7 + xx * 3 + yy * 11
                        + np.where((xx + yy) % 5 == 0, 97, 0)) % 256
                       ).astype(np.uint8)
                payload = encode_jpeg_lossless_arith(
                    img,
                    predictor=1 + (i % 7),
                    restart_interval=40 if i % 3 == 0 else 0,
                    conditioning=(0, 4) if i % 4 == 0 else (0, 1),
                )
                flat = decode_media(payload, "image").astype(np.int64)
                rows.append((
                    i, int(flat.size), int(flat.sum()), int(flat.max()),
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_px", "pixel_sum", "max_px"],
            )

    return d.mapInPandas(
        gen, "media_id long, n_px long, pixel_sum long, max_px int"
    )


@query(
    "multimodal_webp_features",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 24),
    px AS (
      SELECT doc_id,
             (7 * x.v + 11 * y.v + 13 * doc_id + 41 * c.v) % 256 AS v
      FROM ids
      CROSS JOIN (SELECT UNNEST(range(25)) AS v) x
      CROSS JOIN (SELECT UNNEST(range(17)) AS v) y
      CROSS JOIN (SELECT UNNEST(range(3)) AS v) c
    )
    SELECT doc_id AS media_id,
           'lossless' AS flavor,
           CAST(25 AS INT) AS width,
           CAST(17 AS INT) AS height,
           CAST(SUM(v) AS BIGINT) AS px_sum,
           CAST(SUM(CASE WHEN v >= 128 THEN 1 ELSE 0 END) AS BIGINT)
             AS hi_px
    FROM px GROUP BY doc_id
    """,
)
def multimodal_webp_features(spark, sf_dir):
    """Lossless WebP (VP8L, RFC 9649 — round 13: the most common
    post-JPEG/PNG web-corpus image format, previously not even a
    refusal): each document id gets a 25x17 RGB image (channel c at
    (x, y) = (7x + 11y + 13*id + 41c) mod 256), encoded with the
    module's VP8L encoder (odd ids via the LZ77 backref path, even ids
    literal-only), then decoded back through the production
    ``decode_media`` -> ``decode_image_array`` RIFF dispatch and the
    full prefix-code pipeline. Losslessness means DuckDB recomputes the
    exact channel sums closed-form — one wrong canonical code
    assignment, bit-order flip, or prefix-value offset shifts a sum and
    fails the hash. The ``flavor`` column rides through
    ``parse_webp_metadata`` so the container walk is checked too.

    Scale shape: partition-local mapInPandas; image bytes never
    shuffle. Ref parity: the reference has no codecs (extension
    surface)."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.multimodal import decode_media
    from evolution_spark.operators.webp import (
        encode_webp,
        parse_webp_metadata,
    )

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 24
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                yy, xx = np.meshgrid(np.arange(17), np.arange(25),
                                     indexing="ij")
                img = np.stack(
                    [(7 * xx + 11 * yy + 13 * i + 41 * c) % 256
                     for c in range(3)], axis=2
                ).astype(np.uint8)
                payload = encode_webp(img, use_backrefs=bool(i % 2))
                meta = parse_webp_metadata(payload)
                flat = decode_media(payload, "image").astype(np.int64)
                rows.append((
                    i, meta["flavor"], meta["width"], meta["height"],
                    int(flat.sum()),
                    int((flat >= 128).sum()),
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "flavor", "width", "height",
                         "px_sum", "hi_px"],
            )

    return d.mapInPandas(
        gen,
        "media_id long, flavor string, width int, height int, "
        "px_sum long, hi_px long",
    )


@query(
    "multimodal_webp_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'lossless' WHEN 1 THEN 'lossy'
                ELSE 'extended' END AS flavor,
           CASE doc_id % 3 WHEN 0 THEN 'vp8l' WHEN 1 THEN 'vp8'
                ELSE 'vp8x_anim' END AS codec,
           CAST(CASE doc_id % 3 WHEN 0 THEN 10 + doc_id % 7
                WHEN 1 THEN 100 + doc_id ELSE 32 + doc_id END
                AS INT) AS width,
           CAST(CASE doc_id % 3 WHEN 0 THEN 6 + doc_id % 5
                WHEN 1 THEN 50 + doc_id ELSE 24 + doc_id END
                AS INT) AS height,
           CAST(CASE doc_id % 3 WHEN 2
                THEN (2 + doc_id % 3) * (30 + doc_id) * 1000
                ELSE NULL END AS BIGINT) AS duration_us
    FROM documents WHERE doc_id < 24
    """,
)
def multimodal_webp_metadata(spark, sf_dir):
    """All three WebP container flavors through the unified
    ``probe_media`` dispatch (round 13): lossless VP8L (5-byte header
    dims), lossy VP8 (key-frame tag + 0x9d012a start code + 14-bit
    dims), and animated VP8X (canvas from the extended header, total
    duration summed over ANMF frame headers). DuckDB recomputes every
    field closed-form from the fixture formulas.

    Scale shape: header-only mapInPandas probe; payload bytes never
    shuffle. Ref parity: extension surface."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.multimodal import probe_media
    from evolution_spark.operators.webp import (
        build_webp_animation,
        build_webp_lossy,
        encode_webp,
    )

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 24
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf["doc_id"]:
                i = int(i)
                v = i % 3
                if v == 0:
                    img = np.zeros((6 + i % 5, 10 + i % 7, 3),
                                   dtype=np.uint8)
                    pl = encode_webp(img)
                elif v == 1:
                    pl = build_webp_lossy(100 + i, 50 + i)
                else:
                    n = 2 + i % 3
                    pl = build_webp_animation(
                        [(8, 8, 30 + i)] * n,
                        canvas=(32 + i, 24 + i),
                    )
                ids.append(i)
                payloads.append(pl)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = d.mapInPandas(gen, "media_id long, payload binary")
    return probe_media(media).select(
        "media_id",
        F.when(F.col("codec") == "vp8l", "lossless")
         .when(F.col("codec") == "vp8", "lossy")
         .otherwise("extended").alias("flavor"),
        "codec", "width", "height", "duration_us",
    )


@query(
    "audio_metadata_neardup",
    oracle="""
    WITH ids AS (SELECT doc_id AS i FROM documents WHERE doc_id < 30),
    rec AS (
      SELECT i, i // 3 AS g, i % 3 AS j,
             'track ' || CAST(i // 3 AS VARCHAR) AS title_key,
             'artist ' || CAST((i // 3) % 4 AS VARCHAR) AS artist_key,
             CAST((20 + i // 3 + CASE i % 3 WHEN 0 THEN 0 WHEN 1 THEN 1
                   ELSE 6 END) * 1152 * 1000000 // 44100 AS BIGINT)
               AS duration_us
      FROM ids
    )
    SELECT a.title_key, a.artist_key,
           a.i AS left_id, b.i AS right_id,
           b.duration_us - a.duration_us AS gap_us
    FROM rec a JOIN rec b
      ON a.title_key = b.title_key AND a.artist_key = b.artist_key
     AND a.i < b.i
     AND abs(a.duration_us - b.duration_us) <= 80000
    """,
)
def audio_metadata_neardup(spark, sf_dir):
    """Audio-corpus near-duplicate detection by METADATA-KEY BLOCKING
    (round 13 — joins the ID3v2 walker into the dedup surface): 30
    fixture MP3s (10 groups x 3 variants) carry ID3v2 title/artist tags
    that differ in case, punctuation, and whitespace; tags parse
    through the production ``parse_id3v2_tags`` + ``parse_mp3_metadata``
    walkers inside one mapInPandas, normalize to blocking keys
    JVM-side (lower / strip punctuation / collapse whitespace), and a
    self-join WITHIN blocks pairs tracks whose frame-exact durations
    agree within 80 ms. One variant per group is 6 frames longer —
    same metadata, duration outside tolerance — so each group yields
    exactly one pair and the tolerance predicate is load-bearing.
    DuckDB recomputes keys and the frame-time arithmetic closed-form
    from the fixture formulas (integer //, never ROUND), so a wrong
    text-encoding decode, syncsafe size, frame-length slot, or
    normalization step changes the pair set and fails the hash.

    Scale shape: the join is BLOCKED on (title_key, artist_key) —
    never all-pairs; payload bytes stay in the parse stage (only id +
    key + duration rows shuffle). Hot keys (compilation albums) bound
    the block size the same way the MinHash band join bounds cluster
    size. Ref parity: extension surface."""
    import pandas as pd

    from evolution_spark.operators.mp3 import (
        build_id3v2,
        build_mp3,
        parse_id3v2_tags,
        parse_mp3_metadata,
    )

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 30
    )

    def gen_and_parse(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                g, j = i // 3, i % 3
                title = [f"Track {g}", f"track {g}!!",
                         f" TRACK  {g} "][j]
                artist = [f"Artist {g % 4}", f"ARTIST {g % 4}",
                          f"artist  {g % 4}."][j]
                tag = build_id3v2({"TIT2": title, "TPE1": artist},
                                  version=(3, 4, 4)[j],
                                  encoding=(0, 1, 3)[j])
                n = 20 + g + (0, 1, 6)[j]
                # full tag (with its own header) prefixes the stream —
                # build_mp3's id3v2 kwarg takes a BODY and would wrap
                # a second header around it
                payload = tag + build_mp3(n, bitrate_indices=9,
                                          sr_idx=0, seed=i)
                meta = parse_mp3_metadata(payload)
                tags = parse_id3v2_tags(payload)
                rows.append((i, tags.get("TIT2"), tags.get("TPE1"),
                             meta["duration_us"]))
            yield pd.DataFrame(
                rows, columns=["media_id", "title", "artist",
                               "duration_us"])

    meta = d.mapInPandas(
        gen_and_parse,
        "media_id long, title string, artist string, duration_us long",
    )

    def norm(col):
        return F.trim(F.regexp_replace(
            F.regexp_replace(F.lower(col), "[^a-z0-9 ]", ""),
            "\\s+", " "))

    keyed = meta.select(
        F.col("media_id"),
        norm(F.col("title")).alias("title_key"),
        norm(F.col("artist")).alias("artist_key"),
        "duration_us",
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.title_key") == F.col("b.title_key"))
            & (F.col("a.artist_key") == F.col("b.artist_key"))
            & (F.col("a.media_id") < F.col("b.media_id"))
            & (F.abs(F.col("a.duration_us") - F.col("b.duration_us"))
               <= 80000),
        )
        .select(
            F.col("a.title_key").alias("title_key"),
            F.col("a.artist_key").alias("artist_key"),
            F.col("a.media_id").alias("left_id"),
            F.col("b.media_id").alias("right_id"),
            (F.col("b.duration_us") - F.col("a.duration_us"))
            .alias("gap_us"),
        )
    )


def _langid_oracle() -> str:
    """DuckDB oracle for ``language_profile``: embeds the checked-in
    profile weights as a VALUES table and re-implements the rank-weight
    scoring + argmax independently of the Spark plan."""
    from evolution_spark.functions.langid import (
        SEED_TEXTS,
        profile_rows,
    )

    langs = sorted(SEED_TEXTS)
    vals = ",\n      ".join(
        f"('{lang}', '{tri}', {w})" for lang, tri, w in profile_rows()
    )
    inject = " ".join(
        f"WHEN {i} THEN '{SEED_TEXTS[lang]}'"
        for i, lang in enumerate(langs)
    )
    return f"""
    WITH prof(lang, tri, w) AS (VALUES
      {vals}
    ),
    txt AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0
                  THEN trim(regexp_replace(lower(text), '\\s+', ' ',
                                           'g'))
                  ELSE CASE doc_id % 20 {inject} END
             END AS t
      FROM documents WHERE doc_id < 200
    ),
    tg AS (
      SELECT doc_id,
             UNNEST(list_transform(range(greatest(length(t) - 2, 0)),
                                   i -> substr(t, i + 1, 3))) AS tri
      FROM txt
    ),
    scored AS (
      SELECT doc_id, lang, CAST(SUM(w) AS BIGINT) AS score
      FROM tg JOIN prof USING (tri)
      GROUP BY doc_id, lang
    )
    SELECT doc_id, lang AS pred_lang, score
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, lang ASC) = 1
    """


@query("language_profile", oracle=_langid_oracle())
def language_profile(spark, sf_dir):
    """Language identification over a mixed corpus (round 13 — the
    language dimension the Gopher-style quality signals lacked): even
    doc_ids classify their REAL ``documents.text``; odd doc_ids carry
    an injected seed sentence rotating over all 20 languages, so every
    profile is exercised and recovering the injected language
    end-to-end is part of the hash. The classifier is the checked-in
    rank-weight trigram model (functions/langid.py — Cavnar-Trenkle
    family, integer weights); DuckDB re-implements the full scoring
    pipeline (normalize, explode trigrams, join the embedded weight
    table, argmax with the same tie-break) independently.

    Scale shape: 800-row profile BROADCAST; the corpus side shuffles
    once as (doc_id, lang) partial aggregates (map-side combine ships
    at most 20 rows per doc regardless of text size); the argmax
    window partitions by doc_id on the same key. No UDFs — the whole
    plan is codegen. Ref parity: extension surface."""
    from evolution_spark.functions.langid import (
        SEED_TEXTS,
        classify_language,
    )

    langs = sorted(SEED_TEXTS)
    d = table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    )
    inject = F.when(F.lit(False), F.lit(None))
    expr = None
    for i, lang in enumerate(langs):
        cond = (F.col("doc_id") % 20 == i)
        expr = F.when(cond, F.lit(SEED_TEXTS[lang])) if expr is None \
            else expr.when(cond, F.lit(SEED_TEXTS[lang]))
    mixed = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.col("text"))
        .otherwise(expr).alias("text"),
    )
    return classify_language(mixed)


@query(
    "multimodal_webp_animation",
    oracle="""
    WITH ids AS (SELECT doc_id AS i FROM documents WHERE doc_id < 24),
    frames AS (
      SELECT i, 0 AS frame_idx,
             CAST(192 * ((13 * i) % 256) AS BIGINT) AS r_sum
      FROM ids
      UNION ALL
      SELECT i, 1,
             CAST(48 * ((7 * i + 5) % 256)
                  + 144 * CASE WHEN i % 2 = 1 THEN 17
                          ELSE (13 * i) % 256 END AS BIGINT)
      FROM ids
    )
    SELECT i AS media_id, frame_idx, r_sum FROM frames
    """,
)
def multimodal_webp_animation(spark, sf_dir):
    """Animated WebP COMPOSITING end-to-end (round 13): each doc id
    gets a 16x12 two-frame animation — a full-canvas frame (red
    channel 13*id mod 256, dispose-to-background on odd ids) then an
    8x6 rect at (4, 2) (red 7*id+5 mod 256) — decoded through the
    production ``decode_webp_animation`` timeline (VP8L frame decode,
    halved-offset placement, overwrite compositing, ANIM background
    disposal). DuckDB recomputes each composited frame's red-channel
    sum closed-form: a wrong disposal fill, offset doubling, or
    rectangle bound shifts a sum and fails the hash.

    Scale shape: partition-local mapInPandas; payloads never shuffle.
    Ref parity: extension surface."""
    import pandas as pd

    from evolution_spark.operators.webp import (
        build_webp_animation,
        decode_webp_animation,
    )

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 24
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                p = build_webp_animation(
                    [
                        {"w": 16, "h": 12, "dur": 40,
                         "fill": ((13 * i) % 256, 60, 70),
                         "dispose": bool(i % 2)},
                        {"w": 8, "h": 6, "dur": 50, "x": 4, "y": 2,
                         "fill": ((7 * i + 5) % 256, 80, 90)},
                    ],
                    canvas=(16, 12),
                    background=0xFF112233,
                )
                for fi, (_dur, canvas) in enumerate(
                    decode_webp_animation(p)
                ):
                    rows.append((i, fi, int(canvas[..., 0]
                                            .astype("int64").sum())))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "r_sum"])

    return d.mapInPandas(
        gen, "media_id long, frame_idx int, r_sum long"
    )


@query(
    "multimodal_heif_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'heif' WHEN 1 THEN 'avif'
                ELSE 'heif' END AS container,
           CASE doc_id % 3 WHEN 0 THEN 'hevc' WHEN 1 THEN 'av1'
                ELSE NULL END AS codec,
           CAST(64 + 4 * doc_id AS INT) AS width,
           CAST(48 + 2 * doc_id AS INT) AS height
    FROM documents WHERE doc_id < 24
    """,
)
def multimodal_heif_metadata(spark, sf_dir):
    """HEIC/AVIF classification through ``probe_media`` (round 13):
    rotating ftyp brands (heic -> hevc, avif -> av1, mif1 -> codec
    unknown), primary-item dimensions chosen via pitm+ipma over a
    LARGER decoy thumbnail ispe on every third id — the association
    walk, not max-area, must win. DuckDB recomputes every field from
    the fixture formulas.

    Scale shape: header-only mapInPandas probe. Ref parity: extension
    surface."""
    import pandas as pd

    from evolution_spark.operators.mp4 import build_heif
    from evolution_spark.operators.multimodal import probe_media

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 24
    )

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf["doc_id"]:
                i = int(i)
                brand = ("heic", "avif", "mif1")[i % 3]
                thumb = (512, 512) if i % 3 == 2 else None
                payloads.append(build_heif(
                    brand, 64 + 4 * i, 48 + 2 * i, thumb=thumb))
                ids.append(i)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = d.mapInPandas(gen, "media_id long, payload binary")
    return probe_media(media).select(
        "media_id", "container", "codec", "width", "height"
    )


@query(
    "multimodal_exif_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'jpeg' ELSE 'webp' END
             AS container,
           CAST(1 + doc_id % 8 AS INT) AS orientation,
           'Cam' || CAST(doc_id % 5 AS VARCHAR) AS make,
           '2026:01:' || lpad(CAST(1 + doc_id AS VARCHAR), 2, '0')
             || ' 12:00:00' AS datetime_original,
           CAST(100 + doc_id AS BIGINT) AS exif_width,
           CAST(50 + doc_id AS BIGINT) AS exif_height
    FROM documents WHERE doc_id < 24
    """,
)
def multimodal_exif_metadata(spark, sf_dir):
    """EXIF curation fields end-to-end (round 13): each doc id gets a
    real image payload — JPEG on even ids (APP1 Exif segment spliced
    after SOI), lossless WebP rebuilt as a VP8X/EXIF extended container
    on odd — whose EXIF block carries rotating orientation, make, and
    an Exif sub-IFD (DateTimeOriginal + pixel dims); extracted through
    the production ``parse_exif`` IFD walk inside one mapInPandas.
    DuckDB recomputes every field from the fixture formulas — a wrong
    sub-IFD pointer, ASCII NUL strip, byte order, or APP1 scan fails
    the hash.

    Scale shape: header-only (no pixel decode); payloads never
    shuffle. Ref parity: extension surface."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.exif import (
        build_exif,
        embed_exif_jpeg,
        embed_exif_webp,
        parse_exif,
    )
    from evolution_spark.operators.multimodal import encode_jpeg
    from evolution_spark.operators.webp import encode_webp

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 24
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                ex = build_exif(
                    orientation=1 + i % 8,
                    make=f"Cam{i % 5}",
                    datetime_original=f"2026:01:{1 + i:02d} 12:00:00",
                    pixel_xy=(100 + i, 50 + i),
                )
                img = ((i + np.arange(192)) % 256).astype(
                    np.uint8).reshape(8, 8, 3)
                if i % 2 == 0:
                    payload = embed_exif_jpeg(encode_jpeg(img, 70), ex)
                    container = "jpeg"
                else:
                    payload = embed_exif_webp(encode_webp(img), ex)
                    container = "webp"
                m = parse_exif(payload)
                rows.append((
                    i, container, m["orientation"], m["make"],
                    m["datetime_original"], m["exif_width"],
                    m["exif_height"],
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "container", "orientation",
                         "make", "datetime_original", "exif_width",
                         "exif_height"])

    return d.mapInPandas(
        gen,
        "media_id long, container string, orientation int, "
        "make string, datetime_original string, exif_width long, "
        "exif_height long",
    )


@query(
    "multimodal_apng_timeline",
    oracle="""
    WITH ids AS (SELECT doc_id AS i FROM documents WHERE doc_id < 24),
    frames AS (
      SELECT i, 0 AS frame_idx,
             CAST(192 * ((11 * i) % 256) AS BIGINT) AS r_sum
      FROM ids
      UNION ALL
      SELECT i, 1,
             CAST(48 * ((5 * i + 3) % 256)
                  + 144 * CASE WHEN i % 2 = 1 THEN 0
                          ELSE (11 * i) % 256 END AS BIGINT)
      FROM ids
    )
    SELECT i AS media_id, frame_idx, r_sum FROM frames
    """,
)
def multimodal_apng_timeline(spark, sf_dir):
    """APNG animation COMPOSITING end-to-end (round 13): each doc id
    gets a 16x12 two-frame APNG — a full-canvas frame (red 11*id mod
    256, dispose-to-transparent on odd ids) then an 8x6 rect at (4, 2)
    (red 5*id+3 mod 256) — decoded through the production
    ``decode_apng`` timeline (acTL/fcTL/fdAT grouping, per-frame PNG
    synthesis through the from-spec PNG decoder, overwrite compositing,
    dispose-1 clears to TRANSPARENT BLACK, unlike WebP's background
    color — the oracle's CASE encodes exactly that difference). DuckDB
    recomputes each composited frame's red-channel sum closed-form.

    Scale shape: partition-local mapInPandas; payloads never shuffle.
    Ref parity: extension surface."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.apng import build_apng, decode_apng

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 24
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                base = np.zeros((12, 16, 3), dtype=np.uint8)
                base[..., 0] = (11 * i) % 256
                base[..., 1] = 60
                rect = np.zeros((6, 8, 3), dtype=np.uint8)
                rect[..., 0] = (5 * i + 3) % 256
                p = build_apng(
                    [{"img": base, "delay_ms": 40,
                      "dispose": 1 if i % 2 else 0},
                     {"img": rect, "x": 4, "y": 2, "delay_ms": 50}],
                    canvas=(16, 12),
                )
                for fi, (_d, canvas) in enumerate(decode_apng(p)):
                    rows.append((i, fi, int(canvas[..., 0]
                                            .astype("int64").sum())))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "r_sum"])

    return d.mapInPandas(
        gen, "media_id long, frame_idx int, r_sum long"
    )


@query(
    "multimodal_bmp_rle_features",
    oracle="""
    WITH ids AS (SELECT doc_id AS i FROM documents WHERE doc_id < 24),
    px AS (
      SELECT i, (40 * ((x.v + 2 * y.v + i) % 4) + 10 * i) % 256 AS r
      FROM ids
      CROSS JOIN (SELECT UNNEST(range(21)) AS v) x
      CROSS JOIN (SELECT UNNEST(range(9)) AS v) y
    )
    SELECT i AS media_id,
           CAST(SUM(r) AS BIGINT) AS px_sum,
           CAST(SUM(CASE WHEN r >= 128 THEN 1 ELSE 0 END) AS BIGINT)
             AS hi_px
    FROM px GROUP BY i
    """,
)
def multimodal_bmp_rle_features(spark, sf_dir):
    """RLE8-compressed palette BMP decode end-to-end (round 13 — the
    last BMP variant lifted from refusal): each doc id gets a 21x9
    4-color image (index (x + 2y + id) mod 4, red-only palette
    (40k + 10*id) mod 256), hand-packed as BI_RLE8 encoded runs with
    per-row EOL escapes and an EOF terminator, then decoded through the
    production ``decode_media`` -> ``decode_bmp`` path (bottom-up RLE
    contract). Green/blue palette channels are zero so the flat pixel
    sum IS the red sum DuckDB recomputes closed-form — a wrong run
    repeat, nibble order, row flip, or palette lookup fails the hash.

    Scale shape: partition-local mapInPandas; payloads never shuffle.
    Ref parity: extension surface."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.multimodal import decode_media

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 24
    )
    W, H = 21, 9

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                pal = b"".join(
                    bytes([0, 0, (40 * k + 10 * i) % 256, 0])
                    for k in range(4)
                )  # stored BGRA, red-only
                body = bytearray()
                # bottom-up rows: file row r is image row H-1-r
                for r in range(H):
                    y = H - 1 - r
                    x = 0
                    while x < W:
                        v = (x + 2 * y + i) % 4
                        n = 1
                        while x + n < W and (x + n + 2 * y + i) % 4 == v:
                            n += 1
                        body += bytes([min(n, 255), v])
                        x += n
                    body += bytes([0, 0])          # EOL
                body += bytes([0, 1])              # EOF
                data_off = 14 + 40 + len(pal)
                info = ((40).to_bytes(4, "little")
                        + W.to_bytes(4, "little", signed=True)
                        + H.to_bytes(4, "little", signed=True)
                        + (1).to_bytes(2, "little")
                        + (8).to_bytes(2, "little")
                        + (1).to_bytes(4, "little")
                        + len(body).to_bytes(4, "little")
                        + bytes(8) + (4).to_bytes(4, "little")
                        + bytes(4))
                payload = (b"BM"
                           + (data_off + len(body)).to_bytes(4, "little")
                           + bytes(4) + data_off.to_bytes(4, "little")
                           + info + pal + bytes(body))
                flat = decode_media(payload, "image").astype(np.int64)
                rows.append((
                    i, int(flat.sum()), int((flat >= 128).sum() // 1),
                ))
            yield pd.DataFrame(
                rows, columns=["media_id", "px_sum", "hi_px"])

    return d.mapInPandas(
        gen, "media_id long, px_sum long, hi_px long"
    )


@query(
    "audio_id3v22_metadata",
    oracle="""
    WITH ids AS (SELECT doc_id AS i FROM documents WHERE doc_id < 24),
    t AS (
      SELECT i,
             'Album ' || CAST(i % 4 AS VARCHAR) AS album,
             'Sóng ' || CAST(i AS VARCHAR) AS title,
             'Band ' || CAST(i % 3 AS VARCHAR) AS artist,
             CAST(1990 + i % 8 AS VARCHAR) AS year,
             CAST((15 + i % 9) * 1152 * 1000000 // 44100 AS BIGINT)
               AS dur
      FROM ids
    )
    SELECT album,
           CAST(COUNT(*) AS BIGINT) AS n_tracks,
           MIN(title) AS first_title,
           CAST(COUNT(DISTINCT artist) AS BIGINT) AS n_artists,
           CAST(SUM(dur) AS BIGINT) AS total_dur_us,
           MIN(year) AS min_year
    FROM t GROUP BY album
    """,
)
def audio_id3v22_metadata(spark, sf_dir):
    """ID3v2.2 tag walk (round 14, VERDICT item 5 — the legacy 3-byte
    -frame-id tag version gets oracle coverage; it parsed since r13 but
    only unit tests exercised it): 24 fixture MP3s carry v2.2 tags
    (TT2/TP1/TAL/TYE/TRK frames, 3-byte big-endian sizes, no frame
    flags) alternating latin-1 and UTF-16-BOM text encodings, with a
    non-ASCII 'ó' in every title so a mis-decode in either encoding
    shifts first_title and fails the hash. Tags parse through the
    production ``parse_id3v2_tags`` (ids normalized to their v2.3
    names) and durations through ``parse_mp3_metadata``'s frame walk;
    DuckDB recomputes everything closed-form from the fixture formulas
    (frame time = n*1152*1e6 // 44100, integer division both sides).

    Scale shape: one partition-preserving mapInPandas generates and
    parses in place — payload bytes never shuffle; only (album, title,
    artist, year, dur) rows reach the vocabulary-sized aggregate.
    Ref parity: extension surface."""
    import pandas as pd

    from evolution_spark.operators.mp3 import (
        build_mp3,
        parse_id3v2_tags,
        parse_mp3_metadata,
    )

    def v22_tag(frames: list[tuple[bytes, str, int]]) -> bytes:
        """ID3v2.2 tag: 3-byte ids, 3-byte sizes, enc 0 latin-1 /
        enc 1 UTF-16 with BOM (the only v2.2 text encodings)."""
        body = bytearray()
        for fid, text, enc in frames:
            raw = bytes([enc]) + (
                text.encode("latin-1") if enc == 0
                else b"\xff\xfe" + text.encode("utf-16-le")
            )
            body += fid + len(raw).to_bytes(3, "big") + raw
        body += bytes(6)  # padding
        sz = len(body)
        return (b"ID3" + bytes([2, 0, 0])
                + bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                         (sz >> 7) & 0x7F, sz & 0x7F]) + bytes(body))

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 24
    )

    def gen_and_parse(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                enc = i % 2
                tag = v22_tag([
                    (b"TT2", f"Sóng {i}", enc),
                    (b"TP1", f"Band {i % 3}", enc),
                    (b"TAL", f"Album {i % 4}", enc),
                    (b"TYE", str(1990 + i % 8), 0),
                    (b"TRK", str(i), 0),
                ])
                payload = tag + build_mp3(15 + i % 9,
                                          bitrate_indices=9,
                                          sr_idx=0, seed=i)
                tags = parse_id3v2_tags(payload)
                meta = parse_mp3_metadata(payload)
                assert tags["_version"] == "2.2"
                rows.append((i, tags.get("TALB"), tags.get("TIT2"),
                             tags.get("TPE1"), tags.get("TYER"),
                             meta["duration_us"]))
            yield pd.DataFrame(
                rows, columns=["media_id", "album", "title", "artist",
                               "year", "dur"])

    meta = d.mapInPandas(
        gen_and_parse,
        "media_id long, album string, title string, artist string, "
        "year string, dur long",
    )
    return meta.groupBy("album").agg(
        F.count(F.lit(1)).alias("n_tracks"),
        F.min("title").alias("first_title"),
        F.countDistinct("artist").alias("n_artists"),
        F.sum("dur").alias("total_dur_us"),
        F.min("year").alias("min_year"),
    )


@query(
    "multimodal_webp_lossy_features",
    oracle="""
    WITH ids AS (SELECT doc_id AS i FROM documents WHERE doc_id < 30),
    mbs AS (
      SELECT i, 32 + 16 * ((i + bx.v + 2 * by.v) % 12) AS v
      FROM ids
      CROSS JOIN (SELECT UNNEST(range(4)) AS v) bx
      CROSS JOIN (SELECT UNNEST(range(3)) AS v) by
    ),
    px AS (
      SELECT i,
             (298 * ((220 * v + 128) // 256) + 128) // 256 AS g
      FROM mbs
    )
    SELECT i AS media_id,
           CAST(64 AS INT) AS width, CAST(48 AS INT) AS height,
           CAST(SUM(CAST(g AS BIGINT) * 256 * 3) AS BIGINT)
             AS pixel_sum,
           SUM(g * 256 * 3) * 1.0 / (64 * 48 * 3) AS mean_px
    FROM px GROUP BY i
    """,
)
def multimodal_webp_lossy_features(spark, sf_dir):
    """LOSSY VP8 (RFC 6386) decode end-to-end with a value-level
    oracle (round 14, VERDICT item 3 — the largest remaining decode
    gap by corpus bytes is lifted): each document id gets a 64x48 RGB
    image of CONSTANT 16x16 macroblocks (value 32 + 16*((i+mbx+2*mby)
    mod 12)), encoded by the real in-repo VP8 key-frame encoder at
    qi=0 / filter 0 / 16x16-only modes. A constant macroblock survives
    the lossy pipeline EXACTLY: its per-subblock DCT is DC-only, the
    DC stream folds into the Y2 Walsh-Hadamard block whose qi=0
    quantizer (8) divides the 64c coefficient without remainder, and
    the inverse WHT/DCT rounding identities ((64c+3)>>3, (8c+4)>>3)
    return the constant — so the whole chain (boolean arithmetic
    coder, mode trees, token contexts, dequant, WHT+IDCT, intra
    prediction with the 127/129 borders, BT.601 YUV->RGB) is
    bit-reproducible and DuckDB recomputes the same pixel sums closed-
    form: luma = (220v+128)//256 + 16, gray RGB = (298(y-16)+128)//256
    (chroma is exactly 128 -> zero chroma terms). One wrong arithmetic
    split, context, scan position, or border constant shifts pixel_sum
    and fails the hash. (Non-constant content, B_PRED submodes, and
    the loop filter are quantization-lossy by nature — covered by the
    bit-exact encode/decode round-trip matrix in tests/test_vp8.py;
    see operators/vp8.py's docstring for the trained-table validation
    level.)

    Scale shape: synthesis/encode/decode are partition-local
    mapInPandas (Arrow batches); image bytes never shuffle — only the
    5-column feature rows do."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.webp import decode_webp, encode_webp_lossy

    d = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 30
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                img = np.zeros((48, 64), dtype=np.uint8)
                for mby in range(3):
                    for mbx in range(4):
                        img[mby * 16:(mby + 1) * 16,
                            mbx * 16:(mbx + 1) * 16] = \
                            32 + 16 * ((i + mbx + 2 * mby) % 12)
                payload = encode_webp_lossy(
                    np.stack([img] * 3, -1), qi=0, filter_level=0,
                    bpred_bias=1e9)
                # provenance is our own encoder -> the round-trip
                # opt-in is exactly the verified case (decode_webp
                # docstring); the default dispatch keeps refusing
                # arbitrary scraped lossy bytes
                flat = decode_webp(payload, vp8="roundtrip")
                s = int(np.sum(flat.astype(np.int64)))
                rows.append((i, 64, 48, s, s / flat.size))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height",
                               "pixel_sum", "mean_px"])

    return d.mapInPandas(
        gen,
        "media_id long, width int, height int, pixel_sum long, "
        "mean_px double",
    )
