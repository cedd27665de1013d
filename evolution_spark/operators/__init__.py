from evolution_spark.operators.dedup import (
    dedup_exact,
    embedding_near_dups,
    minhash_lsh_candidates,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_signatures,
    simhash_near_dups,
)
from evolution_spark.operators.similarity import cosine_topk, lsh_ann_topk

__all__ = [
    "dedup_exact",
    "minhash_lsh_candidates",
    "minhash_lsh_dedup",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "simhash_near_dups",
    "embedding_near_dups",
    "cosine_topk",
    "lsh_ann_topk",
]
