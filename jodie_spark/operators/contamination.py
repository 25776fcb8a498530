"""Benchmark-contamination detection: find corpus documents that share
word n-grams with an evaluation set, and drop them.

This is the standard decontamination step a training-data pipeline runs
before pretraining (n-gram overlap against held-out benchmarks, n≈13 in
published practice; tune ``n`` down for short eval texts).

Scale design (100 TB corpus, KB-MB eval set):
- the eval side collapses to its DISTINCT n-grams and is broadcast —
  no shuffle of the corpus by gram;
- the corpus side is one projection + explode; the join output shrinks
  to actual overlaps (tiny), so the only shuffle is the final
  ``groupBy(doc_id)`` over matches;
- nothing here is per-row Python — ``word_ngrams`` is a pure
  ``transform``/``slice`` expression inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jodie_spark.functions.text import word_ngrams


def contamination_check(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    eval_text_col: str | None = None,
    min_shared: int = 1,
) -> DataFrame:
    """Return ``(id_col, n_shared_ngrams)`` for every corpus document
    sharing at least ``min_shared`` distinct word ``n``-grams with the
    eval set."""
    eval_text_col = eval_text_col or text_col
    eval_grams = (
        eval_df.select(
            F.explode(word_ngrams(F.col(eval_text_col), n)).alias("__gram__")
        ).distinct()
    )
    doc_grams = corpus.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("__gram__")
    )
    hits = doc_grams.join(F.broadcast(eval_grams), "__gram__")
    return (
        hits.groupBy(id_col)
        .agg(F.count_distinct(F.col("__gram__")).alias("n_shared_ngrams"))
        .filter(F.col("n_shared_ngrams") >= min_shared)
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    eval_text_col: str | None = None,
    min_shared: int = 1,
) -> DataFrame:
    """Corpus minus contaminated documents (left-anti join on the
    flagged ids — ids only cross the shuffle, never document text)."""
    flagged = contamination_check(
        corpus, eval_df, text_col, id_col, n, eval_text_col, min_shared
    ).select(id_col)
    return corpus.join(F.broadcast(flagged), id_col, "left_anti")
