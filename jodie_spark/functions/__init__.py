"""Column-level functions for large-scale text/embedding pipelines."""

from jodie_spark.functions.text import (
    bpe_token_count,
    doc_fingerprint,
    language_id,
    pii_counts,
    pii_scrub,
    quality_score,
    token_count,
    with_text_stats,
)
from jodie_spark.functions.vectors import (
    cosine_similarity,
    l2_norm,
    random_hyperplane_signature,
)

__all__ = [
    "bpe_token_count",
    "doc_fingerprint",
    "language_id",
    "pii_counts",
    "pii_scrub",
    "quality_score",
    "token_count",
    "with_text_stats",
    "cosine_similarity",
    "l2_norm",
    "random_hyperplane_signature",
]
