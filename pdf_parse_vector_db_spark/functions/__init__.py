from pdf_parse_vector_db_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_distance_sq,
    vector_norm,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_distance",
    "l2_distance_sq",
    "vector_norm",
]
