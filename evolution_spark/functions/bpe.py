"""Byte-pair-encoding tokenizer: train greedy merges on the corpus
vocabulary, apply them at scale with an Arrow-batched pandas UDF.

The split mirrors production tokenizer pipelines: training runs where the
data is SMALL (the distinct-word frequency table — top-``max_vocab`` by
frequency via ``TakeOrderedAndProject``, so the driver materialization is
bounded no matter how heavy-tailed the corpus vocabulary is — collected
and merged in pure Python), while application — the part proportional to
corpus size — runs distributed. The merge list broadcasts by closure; each executor
tokenizes Arrow record batches without JVM round-trips per row.

Application is the documented "UDF slow path" used deliberately: greedy
merge application is inherently iterative per word (not expressible in
relational built-ins), so it runs as a pandas UDF over a per-batch
word->tokens memo (each distinct word is tokenized once per batch, not
once per occurrence).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def train_bpe_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int = 50,
    max_vocab: int | None = 65536,
    min_freq: int = 1,
) -> list[tuple[str, str]]:
    """Greedy BPE training: repeatedly merge the most frequent adjacent
    symbol pair in the (word, count) vocabulary. Deterministic: pair ties
    break lexicographically, and the vocabulary arrives sorted.

    One distributed word-count feeds a driver-side merge loop over the
    collected vocabulary — O(vocab) per merge, no further cluster work.

    The driver materialization is BOUNDED (standard BPE practice): only the
    ``max_vocab`` most frequent words (ties broken lexicographically for
    determinism) at or above ``min_freq`` occurrences are collected — a
    ``TakeOrderedAndProject``, so the driver never sees more than
    ``max_vocab`` rows even when a 100 TB web crawl's distinct-"word" set
    (URLs, hashes, typos) is itself cluster-sized. The dropped tail is by
    construction the low-frequency end, which contributes least to pair
    counts; ``max_vocab=None`` restores the unbounded collect for corpora
    known to have driver-sized vocabularies.
    """
    counts = (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_freq > 1:
        counts = counts.where(F.col("n") >= min_freq)
    if max_vocab is not None:
        counts = counts.orderBy(F.desc("n"), F.asc("w")).limit(max_vocab)
    vocab_rows = counts.collect()
    vocab = {
        tuple(r["w"]) + ("</w>",): r["n"]
        for r in sorted(vocab_rows, key=lambda r: r["w"])
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for symbols, n in vocab.items():
            for a, b in zip(symbols, symbols[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged = "".join(best)
        new_vocab: dict[tuple[str, ...], int] = {}
        for symbols, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(symbols):
                if i + 1 < len(symbols) and (symbols[i], symbols[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def bpe_tokens_udf(merges: list[tuple[str, str]]):
    """Arrow-batched tokenizer column: text -> array of BPE tokens.

    The merge ranks ship in the closure (KBs); each batch tokenizes its
    DISTINCT words once via a memo, then maps occurrences — so the per-row
    cost is a dict lookup for all but the first sighting of a word.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def tok(s):  # type: ignore[misc]
        import pandas as pd

        memo: dict[str, list[str]] = {}

        def word_tokens(w: str) -> list[str]:
            got = memo.get(w)
            if got is not None:
                return got
            symbols = list(w) + ["</w>"]
            while len(symbols) > 1:
                best_rank, best_i = None, -1
                for i, pair in enumerate(zip(symbols, symbols[1:])):
                    r = ranks.get(pair)
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_rank is None:
                    break
                symbols[best_i : best_i + 2] = [
                    symbols[best_i] + symbols[best_i + 1]
                ]
            memo[w] = symbols
            return symbols

        def doc_tokens(text) -> list[str]:
            if text is None:
                return []
            out: list[str] = []
            for w in text.lower().split():
                out += word_tokens(w)
            return out

        return pd.Series([doc_tokens(t) for t in s])

    return tok


def bpe_tokenize(
    df: DataFrame, text_col: str, merges: list[tuple[str, str]]
) -> Column:
    """Convenience: the token-array column for ``df[text_col]``."""
    return bpe_tokens_udf(merges)(F.col(text_col))
