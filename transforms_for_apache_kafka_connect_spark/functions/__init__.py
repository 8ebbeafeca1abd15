from transforms_for_apache_kafka_connect_spark.functions.text import (
    add_repetition_stats,
    add_text_stats,
    bm25_rank,
    detect_lang,
    fingerprint,
    prepare_training_docs,
    token_count,
)
from transforms_for_apache_kafka_connect_spark.functions.dedupe import (
    dedup_paragraphs,
    exact_duplicates,
    connected_components,
    minhash_lsh_duplicates,
    near_dup_clusters,
    ngram_jaccard_pairs,
    simhash_signatures,
    embedding_near_duplicates,
)
from transforms_for_apache_kafka_connect_spark.functions.sampling import (
    deterministic_top_sample,
    hash_sample,
    hash_split,
    stratified_sample,
)
from transforms_for_apache_kafka_connect_spark.functions.temporal import (
    asof_join,
    range_join,
    session_summary,
    sessionize,
)
from transforms_for_apache_kafka_connect_spark.functions.similarity import (
    brute_force_topk,
    cosine_expr,
    ivf_topk,
    lsh_topk,
)

__all__ = [
    "hash_split",
    "hash_sample",
    "stratified_sample",
    "deterministic_top_sample",
    "add_repetition_stats",
    "add_text_stats",
    "bm25_rank",
    "dedup_paragraphs",
    "detect_lang",
    "fingerprint",
    "prepare_training_docs",
    "token_count",
    "exact_duplicates",
    "connected_components",
    "minhash_lsh_duplicates",
    "near_dup_clusters",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "embedding_near_duplicates",
    "brute_force_topk",
    "cosine_expr",
    "ivf_topk",
    "lsh_topk",
    "asof_join",
    "range_join",
    "session_summary",
    "sessionize",
]
