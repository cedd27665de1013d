"""Deduplication operators for large-scale training-data pipelines.

Every operator is a pure DataFrame -> DataFrame transformation built from the
expression library in ``evolution_spark.functions`` — no Python in the row
path, no driver-side loops. Scale design notes per operator below; the
shuffle keys are always fixed-width hashes/ids, never document bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from evolution_spark.functions.text import (
    fingerprint128,
    hash32,
    hash60,
    minhash_mix,
    simhash64,
    word_shingles,
)
from evolution_spark.functions.vectors import cosine, lsh_bucket


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one row (min id) per distinct normalized text.

    Scale: one shuffle on the 128-bit fingerprint; the kept-id set joins back
    broadcast-free on the id. 100 TB cost = shuffle of (32B hash, 8B id) per
    row, never the text."""
    fp = df.select(
        F.col(id_col), fingerprint128(F.col(text_col)).alias("__fp")
    )
    keep = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col)).drop("__fp")
    return df.join(keep, id_col, "left_semi")


def dedup_keep_best(
    df: DataFrame,
    text_col: str,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Quality-aware exact dedup: keep the HIGHEST-``score_col`` row per
    distinct normalized text (ties -> min id, deterministic). The curation
    variant of ``dedup_exact``: when the same document was crawled many
    times, keep the best-scored capture (longest, cleanest, latest —
    whatever the score encodes), not the arbitrary min-id one.

    Scale: identical movement contract to ``dedup_exact`` — one shuffle of
    (32 B fingerprint, 8 B id, 8 B score) per row with map-side ``max_by``
    combine; the winner-id set semi-joins back on the id, text never
    crosses the wire."""
    from pyspark.sql.types import NumericType

    if not isinstance(df.schema[score_col].dataType, NumericType):
        raise TypeError(
            f"score_col {score_col!r} must be numeric "
            f"(got {df.schema[score_col].dataType.simpleString()})"
        )
    fp = df.select(
        F.col(id_col),
        fingerprint128(F.col(text_col)).alias("__fp"),
        F.col(score_col).alias("__s"),
    )
    # min_by over (-score, id): highest score wins, min id breaks ties.
    # The id is NEVER negated, so string/any-orderable ids tie-break
    # correctly (negating a string id casts to double -> NULL -> the
    # "deterministic" pick silently became arbitrary).
    winner = F.min_by(
        F.col(id_col), F.struct((-F.col("__s")).alias("__ns"), F.col(id_col))
    ).alias(id_col)
    keep = fp.groupBy("__fp").agg(winner).drop("__fp")
    return df.join(keep, id_col, "left_semi")


def dedup_repeated_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_words: int = 10,
) -> DataFrame:
    """Corpus-wide repeated-span removal: split every document into
    consecutive ``chunk_words``-word chunks, keep only the FIRST occurrence
    of each distinct chunk (ordered by ``(id, chunk_idx)``), and rebuild
    documents from their surviving chunks in order. The span-level analogue
    of ``dedup_exact`` — the curation step that strips boilerplate
    (headers, license blocks, navigation text) repeated across documents
    while keeping each document's unique content. Documents whose every
    chunk was seen earlier vanish (their rebuilt text would be empty).

    Scale (100 TB): winner election is a hash-groupBy of narrow rows
    (two independent 64-bit chunk hashes — 2^-128 collision odds, same
    contract as ``dedup_exact`` — plus id + index), so map-side partial
    aggregation collapses hot chunks BEFORE the shuffle: a chunk repeated
    a million times contributes one row per map task, not a million-row
    window partition. Document text crosses the wire exactly ONCE: the
    kept-index lists (ints) aggregate narrowly per doc, and the rebuild is
    a single join of docs against those lists — chunks re-derive from each
    doc's own row, so no chunk text ever enters the winner shuffles.

    Returns ``(id_col, dedup_text)``.
    """
    k = chunk_words
    words = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(k)).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(words, i * k + 1, F.lit(k)), " "),
    )
    chunks = df.where(F.size(words) > 0).select(
        F.col(id_col), F.posexplode(chunk_arr).alias("chunk_idx", "chunk")
    )
    keyed = chunks.select(
        id_col,
        "chunk_idx",
        F.xxhash64("chunk").alias("__h1"),
        F.xxhash64(F.lit(1), F.col("chunk")).alias("__h2"),
    )
    winners = (
        keyed.groupBy("__h1", "__h2")
        .agg(
            F.min(
                F.struct(F.col(id_col).alias("i"), F.col("chunk_idx").alias("x"))
            ).alias("__w")
        )
        .select(F.col("__w.i").alias(id_col), F.col("__w.x").alias("chunk_idx"))
    )
    kept_idx = winners.groupBy(id_col).agg(
        F.sort_array(F.collect_list("chunk_idx")).alias("__keep")
    )
    # rebuild ONLY the surviving chunks, straight from the word array —
    # no second materialization of the full chunk list
    rebuilt = F.array_join(
        F.transform(
            F.col("__keep"),
            lambda i: F.array_join(F.slice(words, i * k + 1, F.lit(k)), " "),
        ),
        " ",
    )
    return df.join(kept_idx, id_col).select(F.col(id_col), rebuilt.alias("dedup_text"))


# ---------------------------------------------------------------------------
# MinHash-LSH near-dedup
# ---------------------------------------------------------------------------

def _signatures(df: DataFrame, id_col: str, text_col: str, n_hashes: int,
                shingle_k: int) -> DataFrame:
    """(id, s0..s{n-1}) via explode + n min-aggregations: map-side partial
    aggregation collapses the docs x shingles rows before the single shuffle
    on id; every generated method stays small (JIT-friendly)."""
    hs = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), shingle_k)).alias("__sh")
    ).select(id_col, hash32(F.col("__sh")).alias("__h"))
    aggs = [
        F.min(minhash_mix(F.col("__h"), i)).alias(f"s{i}") for i in range(n_hashes)
    ]
    return hs.groupBy(id_col).agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    band_rows: int = 4,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs (id_a, id_b, jaccard) via MinHash-LSH banding.

    Scale shape (the O(n^2)-free near-dedup):
      1. signature: narrow projection + hash-agg (one shuffle on id)
      2. banding: n_hashes/band_rows rows per doc, self-join on
         (band, band_hash) carrying ONLY ids
      3. distinct candidate pairs (tiny), then re-join the raw text to
         compute exact Jaccard just for candidates
    """
    n_bands = n_hashes // band_rows
    sig = _signatures(df, id_col, text_col, n_hashes, shingle_k)
    bands = sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.concat_ws(
                                "-", *[F.col(f"s{b * band_rows + r}") for r in range(band_rows)]
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_hash")
    a = bands.select(F.col(id_col).alias("id_a"), "band_idx", "band_hash")
    b = bands.select(F.col(id_col).alias("id_b"), "band_idx", "band_hash")
    pairs = (
        a.join(b, ["band_idx", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    docs = df.select(F.col(id_col), F.col(text_col))
    pairs_sh = (
        pairs.join(
            docs.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("__ta")), "id_a"
        )
        .join(
            docs.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("__tb")), "id_b"
        )
        .select(
            "id_a",
            "id_b",
            word_shingles(F.col("__ta"), shingle_k).alias("__sa"),
            word_shingles(F.col("__tb"), shingle_k).alias("__sb"),
        )
    )
    jac = F.size(F.array_intersect("__sa", "__sb")) * 1.0 / F.size(
        F.array_union("__sa", "__sb")
    )
    return pairs_sh.select("id_a", "id_b", jac.alias("jaccard")).where(
        F.col("jaccard") >= jaccard_threshold
    )


def minhash_lsh_dedup(
    df: DataFrame, id_col: str, text_col: str, **kwargs
) -> DataFrame:
    """Greedy near-dedup: drop every row that has a confirmed near-duplicate
    with a smaller id (single-pass approximation of connected components —
    each duplicate cluster keeps at least its minimum-id member; a chain
    a~b~c with a<b<c keeps only a, which is the standard greedy outcome)."""
    pairs = minhash_lsh_candidates(df, id_col, text_col, **kwargs)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# n-gram Jaccard (blocked)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    shingle_k: int = 3,
    threshold: float = 0.2,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard over word shingles for pairs sharing a blocking key.
    The block key bounds the quadratic term; use minhash_lsh_candidates when
    no natural blocking key exists.

    Token-join formulation: each (id, gram-hash) explodes once, an
    equi-join on (block, gram) plus a pair-count aggregation computes
    |A∩B| directly — cost follows gram co-frequency (Σ c·(c−1)/2), not
    all-pairs × set-size, and the join rows carry 8-byte hashes, never
    gram text. Pairs sharing no gram (Jaccard 0) are never emitted — the
    token join cannot see them — so ``threshold`` must be > 0; a caller
    wanting the full block-pair matrix including zero-overlap pairs needs
    the quadratic block crossJoin this formulation exists to avoid.
    Skewed corpora with hot grams: ``max_gram_freq`` caps the join's
    quadratic term by dropping STOP-GRAMS — grams shared by more than
    ``max_gram_freq`` documents within a block (each such gram alone
    contributes c*(c-1)/2 join pairs). Per-document set sizes are then
    recounted over the surviving grams, so the result is the EXACT Jaccard
    over the stop-gram-filtered universe: when no gram exceeds the cap the
    output is identical to the uncapped run (equivalence-tested), and when
    the cap bites, boilerplate grams stop both the blowup and their
    (near-zero) similarity signal."""
    if threshold <= 0:
        raise ValueError(
            "threshold must be > 0: zero-overlap pairs are structurally absent "
            "from the token-join formulation"
        )
    sh = df.select(
        F.col(id_col), F.col(block_col).alias("__blk"),
        word_shingles(F.col(text_col), shingle_k).alias("__sh"),
    )
    g = sh.select(
        F.col(id_col), "__blk", F.explode("__sh").alias("__g")
    ).select(F.col(id_col), "__blk", hash60(F.col("__g")).alias("__gh"))
    if max_gram_freq is not None:
        # co-frequency per (block, gram) with map-side combine; the keep
        # list carries (block, 8-byte hash) only — never gram text
        keep = (
            g.groupBy("__blk", "__gh")
            .agg(F.count(F.lit(1)).alias("__c"))
            .where(F.col("__c") <= max_gram_freq)
            .select("__blk", "__gh")
        )
        g = g.join(keep, ["__blk", "__gh"], "left_semi")
        # sizes over SURVIVING grams keeps Jaccard exact in the filtered
        # universe (shingles are distinct, so rows-per-id == set size)
        sizes = g.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"))
    else:
        sizes = sh.select(F.col(id_col), F.size("__sh").alias("__n"))
    a = g.select(F.col(id_col).alias("id_a"), "__blk", "__gh")
    b = g.select(F.col(id_col).alias("id_b"), "__blk", "__gh")
    inter = (
        a.join(b, ["__blk", "__gh"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    joined = (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("__n").alias("__na")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("__n").alias("__nb")), "id_b")
    )
    jac = F.col("__i") * 1.0 / (F.col("__na") + F.col("__nb") - F.col("__i"))
    return joined.select("id_a", "id_b", jac.alias("jaccard")).where(
        F.col("jaccard") >= threshold
    )


# ---------------------------------------------------------------------------
# SimHash near-dedup
# ---------------------------------------------------------------------------

def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) — 60-bit signatures, one narrow projection."""
    return df.select(F.col(id_col), simhash64(F.col(text_col)).alias("simhash"))


def simhash_near_dups(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3,
    n_chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Scale: pigeonhole banding — split the 60-bit signature into n_chunks
    15-bit chunks; any pair within Hamming distance < n_chunks shares at
    least one exact chunk, so candidates come from n_chunks equality
    self-joins (shuffle on (chunk_idx, chunk_value)), never a cross join.
    """
    sig = simhash_signatures(df, id_col, text_col)
    bits_per = 60 // n_chunks
    chunks = sig.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_idx"),
                        F.shiftright(F.col("simhash"), c * bits_per)
                        .bitwiseAND((1 << bits_per) - 1)
                        .alias("chunk_val"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("ch"),
    ).select(id_col, "simhash", "ch.chunk_idx", "ch.chunk_val")
    a = chunks.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("__ha"), "chunk_idx", "chunk_val"
    )
    b = chunks.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("__hb"), "chunk_idx", "chunk_val"
    )
    hamming = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
    return (
        a.join(b, ["chunk_idx", "chunk_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Embedding near-dedup
# ---------------------------------------------------------------------------

def embedding_near_dups(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold.

    Scale: LSH-bucketed — candidates only form within a hyperplane-sign
    bucket (corpus/2^planes per bucket); exact cosine verifies. Highly
    similar vectors agree on almost all hyperplane signs, so recall for
    near-dup thresholds (>=0.9) is high with 8 planes."""
    bucketed = df.select(
        F.col(id_col), F.col(vec_col),
        lsh_bucket(F.col(vec_col), n_planes, dim).alias("__bucket"),
    )
    a = bucketed.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"), "__bucket"
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"), "__bucket"
    )
    return (
        a.join(b, "__bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("__va"), F.col("__vb")).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    threshold: float = 0.99,
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings, then pruning within-cluster
    cosine near-duplicates — documents that say the same thing in
    different words land in the same cluster even when no n-gram overlaps.

    Returns the corpus annotated with ``cell_id`` and ``is_pruned``
    (keep-lowest-id rule: a row is pruned iff some LOWER-id member of its
    cluster has cosine >= threshold with it — deterministic and
    engine-neutral, the standard greedy "keep first" approximation of the
    paper's keep-farthest-from-centroid rule).

    Scale: cell assignment is the zero-shuffle broadcast argmin of
    operators/ivf.py; the only exchange is one hash partition of
    (id, vec) by cell_id, and the pairwise pass is confined to each
    cluster — per-cell cost is bounded by cluster size, and n_cells grows
    with the corpus (the paper runs 50k clusters for LAION-440M), so the
    per-task work stays constant under scale-up. No all-pairs anywhere."""
    from evolution_spark.operators.ivf import assign_cells, sample_centroids

    from evolution_spark.functions.vectors import dot, norm

    centroids = sample_centroids(df, id_col, vec_col, n_cells)
    cells = assign_cells(df, centroids, id_col, vec_col).withColumn(
        # per-row norm hoisted out of the pairwise pass: each candidate
        # pair then costs ONE dot-product fold instead of three (the
        # division dot/(na*nb) is bit-identical to cosine's
        # dot/(sqrt(aa)*sqrt(bb)) — same two doubles multiplied)
        "__nrm",
        norm(F.col(vec_col)),
    )
    # the assignment subtree feeds three consumers (both self-join sides +
    # the final membership join); materialize it once instead of
    # re-running the k x dim argmin fold per consumer. At production scale
    # this materialization IS the cell_id-partitioned layout write
    # (io/ivf_layout.py) — here a lineage-local checkpoint suffices.
    cells = cells.localCheckpoint(eager=False)
    a = cells.select(
        "cell_id", F.col(id_col).alias("__id_a"),
        F.col(vec_col).alias("__va"), F.col("__nrm").alias("__na"),
    )
    b = cells.select(
        "cell_id", F.col(id_col).alias("__id_b"),
        F.col(vec_col).alias("__vb"), F.col("__nrm").alias("__nb"),
    )
    pruned = (
        a.join(b, "cell_id")
        .where(F.col("__id_a") < F.col("__id_b"))
        .where(
            dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
            >= threshold
        )
        .select(F.col("__id_b").alias(id_col))
        .distinct()
    )
    return cells.join(
        pruned.select(F.col(id_col), F.lit(True).alias("is_pruned")),
        id_col,
        "left",
    ).select(
        F.col(id_col),
        "cell_id",
        F.coalesce("is_pruned", F.lit(False)).alias("is_pruned"),
    )


# ---------------------------------------------------------------------------
# WARC revisit dedup (round 14)
# ---------------------------------------------------------------------------

def collapse_revisits(df: DataFrame) -> DataFrame:
    """Consume WARC ``revisit`` records (ISO 28500 §6.7.2 — the crawl's
    BUILT-IN URL-level dedup signal: a crawler that re-fetches a page
    whose payload digest it has already stored writes a payload-less
    revisit record instead of the body) into one original-level view:
    every ``response`` record annotated with how many revisits
    re-observed it and how many payload bytes the crawler's dedup
    saved.

    Matching semantics, in precedence order per record:

    1. ``WARC-Refers-To`` — the explicit record-id link to the
       original (what a well-formed crawler writes).
    2. ``WARC-Payload-Digest`` fallback for revisits without a
       refers-to header (Common Crawl's older segments): the revisit
       attaches to the canonical original for that digest — the
       lexicographically-smallest record_id, a deterministic rule so
       re-runs agree when several originals share a payload.

    Only ``identical-payload-digest`` profile revisits (or revisits
    with no profile header) participate; ``server-not-modified``
    revisits carry no payload digest semantics and are ignored.

    Scale shape: both match paths shuffle (id/digest, count) pairs
    only — never payloads; the final annotate is an id-keyed join of
    the metadata projection (payload column deliberately excluded from
    the output, so original bodies never shuffle either; re-join on
    record_id downstream when bodies are needed). At 100 TB the
    revisit side is payload-less by construction, so its rows are a
    few hundred bytes each.
    """
    originals = df.where(F.col("warc_type") == "response")
    revisits = df.where(
        (F.col("warc_type") == "revisit")
        & (
            F.col("profile").isNull()
            | F.col("profile").contains("identical-payload-digest")
        )
    )
    by_ref = (
        revisits.where(F.col("refers_to").isNotNull())
        .groupBy(F.col("refers_to").alias("record_id"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    # digest fallback: attach to the canonical (min record_id) original
    canon = originals.where(F.col("payload_digest").isNotNull()).groupBy(
        "payload_digest"
    ).agg(F.min("record_id").alias("record_id"))
    by_digest = (
        revisits.where(
            F.col("refers_to").isNull()
            & F.col("payload_digest").isNotNull()
        )
        .groupBy("payload_digest")
        .agg(F.count(F.lit(1)).alias("__n"))
        .join(canon, "payload_digest")
        .select("record_id", "__n")
    )
    counts = (
        by_ref.unionByName(by_digest)
        .groupBy("record_id")
        .agg(F.sum("__n").alias("n_revisits"))
    )
    meta = originals.select(
        "record_id", "uri", "date", "content_type", "http_status",
        "payload_digest", "n_bytes",
    )
    return (
        meta.join(counts, "record_id", "left")
        .na.fill({"n_revisits": 0})
        .withColumn(
            "dup_bytes_saved", F.col("n_revisits") * F.col("n_bytes")
        )
    )


def dedup_crawl_urls(df: DataFrame, uri_col: str = "uri") -> DataFrame:
    """Canonical-URL + payload-digest two-level crawl dedup — the
    standard Common Crawl curation step BEFORE content dedup (and the
    :func:`collapse_revisits` sibling for archives without revisit
    records).

    Level 1 — CAPTURE collapse: recrawls of the same fetch target
    arrive under trivially-different URIs (host case, explicit
    default port, fragment). Group on the canonical URL (the same
    ``canonicalize_url`` the link graph uses: lowercase scheme/host,
    default-port strip, fragment drop) and keep the LATEST capture by
    ``WARC-Date`` (tie: smallest record_id — deterministic re-runs).
    ``n_captures`` counts the collapsed group.

    Level 2 — CONTENT-alias collapse among the URL winners: distinct
    URLs serving byte-identical payloads (mirrors, tracking-parameter
    twins that survive canonicalization, www/apex duplicates) share a
    ``WARC-Payload-Digest``; the lexicographically-smallest canonical
    URL becomes the representative (``rep_url``), the others are
    flagged ``is_content_canonical = false`` with ``n_url_aliases``
    counting the alias group beyond the representative. Records with
    a NULL digest never collapse (unknown content is kept).

    Returns one row per URL winner (both canonical and alias rows —
    filter on ``is_content_canonical`` to materialize the deduped
    set; aliases carry the counts an audit needs).

    Scale shape: the payload column is PROJECTED AWAY before the
    first exchange, so document bodies never shuffle — both levels
    move (canonical_url, date, record_id, digest, n_bytes) metadata
    only; each level is a single hash-partitioned window (URL key,
    then digest key). Canonicalization is an Arrow-batched pandas
    UDF (the one Python step; pure string work per row).

    Ref parity: extension surface (crawl curation; the reference
    ingests fixed-length files only — crates/evolution-slicer)."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    from evolution_spark.operators.html import canonicalize_url

    # explicit returnType style: the module's deferred annotations
    # (`from __future__ import annotations`) would stringify the
    # pd.Series hints and break pandas_udf's type inference
    _canon = pandas_udf(
        lambda uris: uris.map(
            lambda u: canonicalize_url(u) if u is not None else None),
        "string",
    )

    meta = df.where(F.col("warc_type") == "response").select(
        "record_id", F.col(uri_col).alias("uri"),
        _canon(F.col(uri_col)).alias("canonical_url"),
        "date", "content_type", "http_status", "payload_digest",
        "n_bytes",
    )
    w_url = Window.partitionBy("canonical_url")
    w_pick = w_url.orderBy(F.col("date").desc(),
                           F.col("record_id").asc())
    winners = (
        meta.withColumn("__rn", F.row_number().over(w_pick))
        .withColumn("n_captures", F.count(F.lit(1)).over(w_url))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    w_digest = Window.partitionBy("payload_digest")
    has_digest = F.col("payload_digest").isNotNull()
    return (
        winners
        .withColumn(
            "rep_url",
            F.when(has_digest,
                   F.min("canonical_url").over(w_digest))
            .otherwise(F.col("canonical_url")),
        )
        .withColumn(
            "n_url_aliases",
            F.when(has_digest,
                   F.count(F.lit(1)).over(w_digest) - F.lit(1))
            .otherwise(F.lit(0)).cast("long"),
        )
        .withColumn(
            "is_content_canonical",
            F.col("canonical_url") == F.col("rep_url"),
        )
    )
