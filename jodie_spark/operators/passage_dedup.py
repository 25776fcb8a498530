"""Cross-document passage-level duplication analysis — the
"Deduplicating Training Data Makes Language Models Better"
(Lee et al., 2022) signal, at the document-filtering granularity that
scales: hash every k-token window, find windows occurring more than
once across the corpus, and score each document by the fraction of
its windows that are corpus-duplicated. Boilerplate-heavy and
template-generated documents score near 1, unique prose near 0.

(The paper's exact-substring *excision* needs a corpus-wide suffix
array — O(corpus) memory on one machine. Window-hash scoring + a
document-level cut is the standard distributed approximation; pair it
with ``line_dedup`` for intra-line boilerplate removal.)

Scale design:
- The only wide value (the text) never shuffles: windows are reduced
  to a 60-bit hash **in the scan projection** (pure md5/conv
  expressions — whole-stage codegen), so both shuffles — the
  window-count groupBy and the per-doc stats groupBy — carry
  (id, pos, hash) longs, ~24 bytes per window.
- The duplicated-window set is NOT broadcast: it is corpus-sized in
  the worst case, so it joins shuffle-to-shuffle on the hash. AQE
  converts it to broadcast automatically when it turns out small.
- The hash is engine-portable (md5-prefix, same value in DuckDB), so
  the whole operator is value-checkable by a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jodie_spark.functions.text import word_ngrams


def _window_hash_col(gram):
    # 15 hex chars = 60 bits: fits a signed long, collision rate
    # ~n²/2⁶¹ (negligible below 10⁹ windows per corpus); identical to
    # DuckDB's cast(concat('0x', substr(md5(g),1,15)) as ubigint)
    return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")


def passage_window_hashes(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8
) -> DataFrame:
    """One row per k-token window: ``(id_col, pos, whash)`` with
    1-based ``pos``. Documents shorter than ``k`` tokens emit no
    rows."""
    grams = word_ngrams(F.col(text_col), k)
    return (
        df.select(id_col, F.posexplode(grams).alias("pos0", "__g__"))
        .select(
            id_col,
            (F.col("pos0") + 1).alias("pos"),
            _window_hash_col(F.col("__g__")).alias("whash"),
        )
    )


def dup_passage_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Per-document duplication stats: ``(id_col, n_windows,
    n_dup_windows, dup_fraction)``.

    A window is duplicated when its hash occurs ≥ ``min_count`` times
    corpus-wide (occurrences within one document count — a doc that
    repeats its own passage is as duplicated as two docs sharing it).
    Documents with fewer than ``k`` tokens report 0 windows and
    fraction 0.0.
    """
    wins = passage_window_hashes(df, text_col, id_col, k)
    counts = wins.groupBy("whash").agg(F.count(F.lit(1)).alias("__n__"))
    flagged = wins.join(counts, "whash").select(
        id_col, (F.col("__n__") >= min_count).cast("int").alias("__dup__")
    )
    per_doc = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("__dup__").alias("n_dup_windows"),
    )
    ids = df.select(id_col).distinct()
    return ids.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_windows"), F.lit(0)).cast("long").alias("n_windows"),
        F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("long").alias("n_dup_windows"),
        F.when(
            F.coalesce(F.col("n_windows"), F.lit(0)) > 0,
            F.round(F.col("n_dup_windows") / F.col("n_windows"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_fraction"),
    )


def passage_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    max_dup_fraction: float = 0.3,
    min_count: int = 2,
) -> DataFrame:
    """Drop documents whose duplicated-window fraction exceeds
    ``max_dup_fraction``. Returns ``df``'s columns unchanged."""
    stats = dup_passage_stats(df, text_col, id_col, k, min_count)
    keep = stats.filter(F.col("dup_fraction") <= max_dup_fraction).select(id_col)
    return df.join(keep, id_col, "left_semi")
