from dataframe_kotlin_spark.functions.math import digitize, between
from dataframe_kotlin_spark.functions.text import (
    tokens,
    token_count,
    shingles,
    word_shingles,
    doc_fingerprint,
    quality_score,
    stopword_ratio,
)

__all__ = [
    "digitize",
    "between",
    "tokens",
    "token_count",
    "shingles",
    "word_shingles",
    "doc_fingerprint",
    "quality_score",
    "stopword_ratio",
]
