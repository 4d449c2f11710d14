from bighouse_spark.functions.hashing import row_hash, row_md5, table_checksum
from bighouse_spark.functions.text import (
    language_id,
    quality_features,
    token_count,
    tokens,
    word_shingles,
)
from bighouse_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "row_hash",
    "row_md5",
    "table_checksum",
    "language_id",
    "quality_features",
    "token_count",
    "tokens",
    "word_shingles",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
