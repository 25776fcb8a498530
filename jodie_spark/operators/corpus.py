"""End-to-end corpus cleaning: the composition a training-data pipeline
actually runs — text statistics → quality gate → language filter →
exact dedup → (optional) fuzzy dedup.

Single-scan design: every per-document signal (token count, language,
quality, fingerprint) is computed in ONE projection; the quality and
language gates are plain filters over it (no extra scans); exact dedup
is one hash shuffle; MinHash dedup (opt-in) adds its bucket join. At
100 TB the whole non-fuzzy path is one scan + one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jodie_spark.functions.text import with_text_stats
from jodie_spark.operators.text_dedup import minhash_dedup


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    min_tokens: int = 10,
    languages: list[str] | None = None,
    fuzzy: bool = False,
    fuzzy_kwargs: dict | None = None,
) -> DataFrame:
    """Returns the surviving documents with the computed signal columns
    (``n_tokens``, ``lang_id``, ``quality``, ``fingerprint``) attached.

    Survivors satisfy: quality ≥ min_quality, n_tokens ≥ min_tokens,
    lang_id ∈ languages (when given), and are the lowest-id document for
    their content fingerprint. ``fuzzy=True`` additionally runs MinHash
    LSH dedup over the exact-deduped set.
    """
    scored = with_text_stats(df, text_col)
    gated = scored.filter(
        (F.col("quality") >= min_quality) & (F.col("n_tokens") >= min_tokens)
    )
    if languages:
        gated = gated.filter(F.col("lang_id").isin(list(languages)))
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col))
    deduped = (
        gated.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )
    if fuzzy:
        deduped = minhash_dedup(deduped, text_col, id_col, **(fuzzy_kwargs or {}))
    return deduped
