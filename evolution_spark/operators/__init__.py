from evolution_spark.operators.dedup import (
    dedup_exact,
    embedding_near_dups,
    minhash_lsh_candidates,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_signatures,
    simhash_near_dups,
)
from evolution_spark.operators.graph import connected_components, dedup_clusters
from evolution_spark.operators.rank import ntile_from_rank, with_global_rank
from evolution_spark.operators.temporal import (
    asof_join,
    range_join,
    scd2_from_changelog,
    sessionize,
)
from evolution_spark.operators.similarity import cosine_topk, lsh_ann_topk
from evolution_spark.operators.curation import (
    chunk_tokens,
    dequantize_embeddings,
    quantize_embeddings_int8,
    sample_deterministic,
    scrub_patterns,
    split_assign,
)

__all__ = [
    "asof_join",
    "range_join",
    "scd2_from_changelog",
    "sessionize",
    "ntile_from_rank",
    "with_global_rank",
    "chunk_tokens",
    "dequantize_embeddings",
    "quantize_embeddings_int8",
    "sample_deterministic",
    "scrub_patterns",
    "split_assign",
    "dedup_exact",
    "minhash_lsh_candidates",
    "minhash_lsh_dedup",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "simhash_near_dups",
    "embedding_near_dups",
    "connected_components",
    "dedup_clusters",
    "cosine_topk",
    "lsh_ann_topk",
]
