"""Edit-distance (fuzzy) string self-join: all pairs within Levenshtein
distance <= k, without a cartesian product.

Algorithm: PassJoin-style segment filtering (Li, Deng, Feng — VLDB 2012).
Pigeonhole: partition a string into k+1 contiguous segments; any string
within edit distance k of it must contain at least ONE of those segments
as an EXACT substring, at a position shifted by at most k. So:

* probe side: each string of length ``la`` emits its k+1 (slot, segment)
  keys — O(k) keys per row;
* candidate side: each string of length ``lb`` emits, for every possible
  partner length ``la`` in [lb-k, lb+k] and slot, the substrings at the
  slot's expected position shifted by d in [-k, +k] — O(k^3) keys per
  row, a CONSTANT (k is 1-3 in practice);
* candidates = equality join on (la, slot, substring) — a plain
  shuffle/broadcast hash join, never an all-pairs cross join;
* verify: Spark's built-in ``levenshtein`` (JVM codegen) on the deduped
  candidate pairs only.

Scale: the joins are keyed equality joins with map-side-combinable key
streams; cost tracks segment-key co-frequency (like the n-gram Jaccard
token join in operators/dedup.py), not |A| x |B|. Segment keys are short
substrings — hot keys (common prefixes) behave like hot grams and can be
salted the same way if a corpus demands it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _segments(col, length, k: int):
    """k+1 even segments of ``col`` (1-based positions) as an array of
    (slot, start, seg_len) structs, computed in pure JVM expressions.
    Segment i gets len//(k+1) chars, the last ``len %% (k+1)`` segments
    one extra (the standard even partition)."""
    n = k + 1
    base = (length / n).cast("int")
    extra = length % n
    return F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda i: F.struct(
            i.alias("slot"),
            # start = i*base + max(0, i - (n - extra)) ; segments with
            # index >= n-extra are one longer
            (
                i * base
                + F.greatest(F.lit(0), i - (F.lit(n) - extra))
                + F.lit(1)
            ).alias("start"),
            F.when(i >= F.lit(n) - extra, base + 1).otherwise(base).alias("seg_len"),
        ),
    )


def edit_distance_join(
    df: DataFrame, id_col: str, str_col: str, k: int = 2,
    k1_max_len: int = 64,
) -> DataFrame:
    """All pairs (id_a < id_b) with levenshtein(s_a, s_b) <= k.

    Returns (id_a, id_b, dist). Exact — the candidate filter is lossless,
    verification is exact Levenshtein.

    Strategy: for k == 1 the candidate keys are DELETION VARIANTS
    (FastSS, Bocek et al. 2007): each string joins on itself plus its
    |s| one-character deletions. If ed(s, t) <= 1 the two variant sets
    intersect (equal -> s itself; deletion/insertion -> the shorter
    string is a variant of the longer; substitution -> deleting the
    substituted position from both gives the same string), so the
    equality join is a lossless candidate filter. Unlike the k+1-segment
    pigeonhole, no key is a short shared SUBSTRING: corpora with a
    constant prefix/suffix (catalog names, URLs, file paths — any
    "PREFIX#<number>" shape) make some segment identical across ALL
    rows, which degenerates the segment join into the cross product the
    operator exists to avoid. Deletion variants keep every distinguishing
    character in the key, so co-frequency tracks true near-duplicates.
    Cost: |s|+1 keys of |s|-1 chars per row (vs O(k^3) constant-count
    segment keys) — the right trade for match/name-length strings, but
    O(|s|^2) key bytes per row, which regresses LONG-string corpora. So
    the k==1 dispatch is banded by ``k1_max_len`` (r16, per advisor):
    strings of length <= cap pair via deletion variants; pairs with a
    member longer than the cap go through the segment path restricted to
    strings of length >= cap. ed<=1 bounds the length gap at 1, so a pair
    with one member > cap has BOTH members >= cap — the two bands are
    jointly complete, and the segment band keeps only pairs whose longer
    member exceeds the cap, so they are disjoint (no duplicate pairs).
    ``k1_max_len <= 0`` forces the segment path outright.
    """
    s = df.select(
        F.col(id_col).alias("__id"),
        F.col(str_col).alias("__s"),
        F.length(str_col).alias("__len"),
    )
    if k == 1 and k1_max_len > 0:
        short = _deletion_variant_join_k1(
            s.where(F.col("__len") <= k1_max_len)
        )
        longer = _segment_join(
            s.where(F.col("__len") >= k1_max_len), 1,
            require_longer_than=k1_max_len,
        )
        return short.unionByName(longer)
    return _segment_join(s, k)


def _segment_join(
    s: DataFrame, k: int, require_longer_than: int | None = None
) -> DataFrame:
    """PassJoin segment-filter join over a prepared (__id, __s, __len)
    frame. ``require_longer_than`` keeps only pairs whose LONGER member
    exceeds the given length (the k==1 band split above)."""
    # probe side: the k+1 segments of each string
    probe = s.select(
        "__id",
        "__s",
        F.col("__len").alias("__la"),
        F.explode(_segments(F.col("__s"), F.col("__len"), k)).alias("g"),
    ).select(
        F.col("__id").alias("id_a"),
        F.col("__s").alias("__sa"),
        "__la",
        F.col("g.slot").alias("__slot"),
        F.substring(F.col("__s"), F.col("g.start"), F.col("g.seg_len")).alias("__seg"),
    )
    # candidate side: substrings at every (partner length, slot, shift)
    cand = (
        s.select(
            "__id",
            "__s",
            "__len",
            F.explode(
                F.sequence(
                    # clamp to 0, not 1: a length-0 partner (the empty
                    # string) is a legal match within k edits, and the
                    # probe side emits __la=0 for it
                    F.greatest(F.col("__len") - k, F.lit(0)), F.col("__len") + k
                )
            ).alias("__la"),
        )
        .select(
            "__id",
            "__s",
            "__len",
            "__la",
            F.explode(_segments(F.col("__s"), F.col("__la"), k)).alias("g"),
        )
        .select(
            "__id",
            "__s",
            "__la",
            F.col("g.slot").alias("__slot"),
            F.col("g.seg_len").alias("__sl"),
            # empty array (explode drops the row) when the string is too
            # short to contain the segment at any shifted position — a bare
            # sequence(lo, hi) with hi < lo would run DESCENDING in Spark
            F.explode(
                F.when(
                    F.least(
                        F.col("g.start") + k,
                        F.col("__len") - F.col("g.seg_len") + 1,
                    )
                    >= F.greatest(F.col("g.start") - k, F.lit(1)),
                    F.sequence(
                        F.greatest(F.col("g.start") - k, F.lit(1)),
                        F.least(
                            F.col("g.start") + k,
                            F.col("__len") - F.col("g.seg_len") + 1,
                        ),
                    ),
                ).otherwise(F.expr("array()").cast("array<int>"))
            ).alias("__start"),
        )
        .where(F.col("__start") >= 1)
        .select(
            F.col("__id").alias("id_b"),
            F.col("__s").alias("__sb"),
            "__la",
            "__slot",
            F.substring(F.col("__s"), F.col("__start"), F.col("__sl")).alias("__seg"),
        )
    )
    pairs = (
        probe.join(cand, ["__la", "__slot", "__seg"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "__sa", "id_b", "__sb")
        .distinct()
    )
    if require_longer_than is not None:
        pairs = pairs.where(
            F.greatest(F.length("__sa"), F.length("__sb"))
            > require_longer_than
        )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.levenshtein("__sa", "__sb").alias("dist"),
        )
        .where(F.col("dist") <= k)
    )


def _deletion_variant_join_k1(s: DataFrame) -> DataFrame:
    """FastSS candidate join for k == 1 over a prepared (__id, __s, ...)
    frame (see edit_distance_join docstring for the losslessness
    argument). array_distinct collapses the repeated variants a run of
    equal characters produces ("aab" deletes to "ab" twice), so each row
    emits each distinct key once."""
    s = s.select("__id", "__s")
    sc, ln = F.col("__s"), F.length("__s")
    dels = F.when(
        ln > 0,
        F.transform(
            F.sequence(F.lit(1), ln),
            lambda i: F.concat(
                sc.substr(F.lit(1), i - F.lit(1)), sc.substr(i + F.lit(1), ln)
            ),
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))
    keyed = s.select(
        "__id", "__s", F.explode(F.array_distinct(F.concat(F.array(sc), dels))).alias("__v")
    )
    pairs = (
        keyed.select(F.col("__id").alias("id_a"), F.col("__s").alias("__sa"), "__v")
        .join(
            keyed.select(F.col("__id").alias("id_b"), F.col("__s").alias("__sb"), "__v"),
            "__v",
        )
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "__sa", "id_b", "__sb")
        .distinct()
    )
    return pairs.select(
        "id_a", "id_b", F.levenshtein("__sa", "__sb").alias("dist")
    ).where(F.col("dist") <= 1)
