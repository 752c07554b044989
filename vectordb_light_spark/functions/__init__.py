"""Column-level function library (JVM-side builtins wherever possible)."""

from vectordb_light_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
    l2_normalize,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "l2_normalize",
]
