"""Column-level functions for large-scale text/embedding pipelines."""

from jodie_spark.functions.normalize import (
    clean_whitespace,
    normalize_text,
    strip_control_chars,
    unicode_normalize,
)
from jodie_spark.functions.text import (
    bpe_token_count,
    doc_fingerprint,
    dup_ngram_fraction,
    language_id,
    pii_counts,
    pii_scrub,
    quality_score,
    repetition_signals,
    token_count,
    with_text_stats,
    word_ngrams,
)
from jodie_spark.functions.urls import (
    filter_by_domain,
    url_domain,
    url_host,
    url_path,
    with_url_parts,
)
from jodie_spark.functions.vectors import (
    cosine_similarity,
    int8_quantize,
    l2_norm,
    l2_normalize,
    random_hyperplane_signature,
)

__all__ = [
    "bpe_token_count",
    "clean_whitespace",
    "normalize_text",
    "strip_control_chars",
    "unicode_normalize",
    "filter_by_domain",
    "url_domain",
    "url_host",
    "url_path",
    "with_url_parts",
    "doc_fingerprint",
    "dup_ngram_fraction",
    "language_id",
    "pii_counts",
    "pii_scrub",
    "quality_score",
    "repetition_signals",
    "token_count",
    "with_text_stats",
    "word_ngrams",
    "cosine_similarity",
    "int8_quantize",
    "l2_norm",
    "l2_normalize",
    "random_hyperplane_signature",
]
