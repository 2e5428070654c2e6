"""Relational + data-pipeline operators built on public PySpark APIs."""

from spark_extensions_spark.operators.joins import (
    asof_join,
    interval_join,
    salted_join,
)
from spark_extensions_spark.operators.dedup import (
    exact_dedup,
    minhash_signatures,
    minhash_lsh_candidates,
    simhash,
    ngram_jaccard_pairs,
    embedding_neardup_pairs,
)
from spark_extensions_spark.operators.sketches import (
    approx_quantiles,
    bloom_filter,
    bloom_semi_join,
    count_min_sketch,
    freq_items,
)
from spark_extensions_spark.operators.similarity import (
    cosine_similarity_col,
    ann_bruteforce_topk,
    ann_lsh_topk,
    ann_ivf_topk,
)

__all__ = [
    "asof_join",
    "interval_join",
    "salted_join",
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash",
    "ngram_jaccard_pairs",
    "embedding_neardup_pairs",
    "cosine_similarity_col",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "count_min_sketch",
    "bloom_filter",
    "bloom_semi_join",
    "freq_items",
    "approx_quantiles",
]
