from bighouse_spark.operators.asof import asof_join
from bighouse_spark.operators.dedup import (
    exact_dedup,
    fingerprint_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from bighouse_spark.operators.similarity import (
    brute_force_topk,
    lsh_ann_topk,
)

__all__ = [
    "asof_join",
    "exact_dedup",
    "fingerprint_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_pairs",
    "brute_force_topk",
    "lsh_ann_topk",
]
