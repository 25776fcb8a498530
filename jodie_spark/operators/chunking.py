"""Document chunking: split long documents into token-bounded windows
(the context-length preprocessing step of every LLM training pipeline).

One projection + one ``posexplode`` — chunk boundaries are computed as
a ``sequence``/``slice`` expression over whitespace tokens, entirely
inside whole-stage codegen. No shuffle at all: chunks stay in the
partition of their parent document, so a 100 TB corpus chunks at full
scan speed and the downstream writer controls the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jodie_spark.functions.text import ws_tokens


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 128,
    overlap: int = 0,
) -> DataFrame:
    """Explode each document into chunks of up to ``max_tokens``
    whitespace tokens, consecutive chunks sharing ``overlap`` tokens.

    Returns ``(id_col, chunk_id, chunk_text, n_chunk_tokens)``; blank
    documents produce no chunks. Chunk text preserves original casing
    (tokenization splits on whitespace only); ``chunk_id`` is 0-based
    in document order.
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap} for max_tokens={max_tokens}"
        )
    stride = max_tokens - overlap
    # the token array reaches the per-chunk lambda through a lambda
    # variable — a free column expression would be inlined by Catalyst
    # and re-tokenize the document once per chunk (O(len²/stride))
    t = ws_tokens(F.col(text_col), lowercase=False)
    chunks = F.transform(
        F.array(F.struct(t.alias("t"))),
        lambda w: F.transform(
            F.when(
                F.size(w["t"]) > 0,
                F.sequence(F.lit(1), F.size(w["t"]), F.lit(stride)),
            ),
            lambda s: F.struct(
                F.array_join(F.slice(w["t"], s, max_tokens), " ").alias("chunk_text"),
                F.size(F.slice(w["t"], s, max_tokens)).cast("long").alias("n_chunk_tokens"),
            ),
        ),
    )[0]
    exploded = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "__chunk__")
    )
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("__chunk__.chunk_text").alias("chunk_text"),
        F.col("__chunk__.n_chunk_tokens").alias("n_chunk_tokens"),
    )
