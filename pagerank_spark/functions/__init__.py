"""Reusable column-level functions (all JVM-side expressions).

These are the engine's scalar/array building blocks, shared by the
operators and usable directly in user queries. Everything here returns
``pyspark.sql.Column`` built from built-in functions — whole-stage
codegen, no UDFs.
"""

from pagerank_spark.functions.vector import cosine_similarity, dot, l2_norm
from pagerank_spark.functions.text import (
    occurrences,
    shingles,
    token_count,
    word_occurrences,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "occurrences",
    "shingles",
    "token_count",
    "word_occurrences",
]
