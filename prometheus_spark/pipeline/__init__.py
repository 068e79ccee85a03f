from prometheus_spark.pipeline.dedup import (
    connected_components,
    cross_corpus_exact_dedup,
    decontaminate,
    dedup_representatives,
    exact_dedup,
    minhash_signatures,
    minhash_dup_candidates,
    minhash_dup_candidates_portable,
    simhash_64,
    simhash_64_portable,
    ngram_jaccard_pairs,
    embedding_near_dup_pairs,
)
from prometheus_spark.pipeline.similarity import (
    AnnIndex,
    cosine_topk_bruteforce,
    lsh_bucketed_topk,
)
from prometheus_spark.pipeline.textstats import (
    token_count,
    quality_score,
    lang_id,
    fingerprint,
    repetition_ratio,
    topk_ngrams,
    stratified_sample,
)
from prometheus_spark.pipeline.sessions import (
    sessionize,
    session_stats,
)

__all__ = [
    "connected_components",
    "cross_corpus_exact_dedup",
    "decontaminate",
    "dedup_representatives",
    "exact_dedup",
    "minhash_signatures",
    "minhash_dup_candidates",
    "minhash_dup_candidates_portable",
    "simhash_64",
    "simhash_64_portable",
    "ngram_jaccard_pairs",
    "embedding_near_dup_pairs",
    "AnnIndex",
    "cosine_topk_bruteforce",
    "lsh_bucketed_topk",
    "token_count",
    "quality_score",
    "lang_id",
    "fingerprint",
    "repetition_ratio",
    "topk_ngrams",
    "stratified_sample",
    "sessionize",
    "session_stats",
]
