"""Exact substring deduplication (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better"): remove every token span
whose ``window``-token content appears elsewhere in the corpus, keeping
exactly one occurrence (the lexicographically first by (doc_id,
position)). Unlike document-level dedup this catches boilerplate,
licenses, and quoted passages embedded inside otherwise-unique
documents — the paper found ~1% of C4 tokens are exact substring
duplicates that document dedup misses.

The paper builds a corpus-wide suffix array; the Spark-native shape is
hashed fixed-size windows, which finds exactly the duplicated spans of
length ≥ ``window`` tokens (a duplicated span of length L ≥ W is
covered by its L−W+1 duplicated windows; spans < W tokens are below
the removal threshold by definition):

1. one projection builds each document's token array and the rolling
   window hashes via ``transform``/``slice``/``concat_ws`` — pure
   codegen, no UDF;
2. keeper election is a ``groupBy(hash).agg(count, min(struct(doc_id,
   pos)))`` — map-side combine collapses even a pathologically hot
   hash (corpus-wide boilerplate in millions of documents) to one row
   per partition before the shuffle, and the join-back that marks
   non-keepers is an equi-join AQE's skew handling can split (a
   ``row_number() over (partition by hash)`` window would serialize
   the hot hash into one task with no skew mitigation). The shuffle
   carries (hash, doc_id, pos) — 8-byte ``xxhash64`` by default, so
   bytes shuffled ≈ 24·tokens regardless of text size;
3. removed windows explode to covered token indexes; survivors
   reassemble per document with a sort inside one aggregation.

Output text is whitespace-normalized (tokens rejoined with single
spaces) — the same normalization the dedup compares with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _window_hash(window_text, hash_fn: str):
    if hash_fn == "md5":
        return F.md5(window_text)
    if hash_fn == "xxhash64":
        return F.xxhash64(window_text)
    raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("__id__"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__w__"),
    ).filter(F.length(F.trim(F.col(text_col))) > 0)


def _removed_windows(
    toks: DataFrame, window: int, hash_fn: str
) -> DataFrame:
    """(__id__, pos) of every duplicated-window occurrence EXCEPT the
    corpus-wide keeper (min doc_id, then min pos). pos is 1-based."""
    wins = toks.filter(F.size("__w__") >= window).select(
        "__id__",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("__w__") - window + 1),
                lambda i: _window_hash(
                    F.concat_ws(" ", F.slice("__w__", i, window)), hash_fn
                ),
            )
        ).alias("__p0__", "__h__"),
    ).select("__id__", (F.col("__p0__") + 1).alias("pos"), "__h__")
    dup_keepers = (
        wins.groupBy("__h__")
        .agg(
            F.count(F.lit(1)).alias("__cnt__"),
            # struct min = lexicographic (doc_id, pos): the corpus-wide
            # first occurrence
            F.min(F.struct("__id__", "pos")).alias("__keeper__"),
        )
        .filter("__cnt__ > 1")
        .select("__h__", "__keeper__")
    )
    return (
        wins.join(dup_keepers, "__h__")
        .filter(
            (F.col("__id__") != F.col("__keeper__.__id__"))
            | (F.col("pos") != F.col("__keeper__.pos"))
        )
        .select("__id__", "pos")
    )


def duplicate_window_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 15,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per document: total windows and how many are non-keeper
    duplicates — the audit view before committing to removal."""
    toks = _tokens(df, text_col, id_col)
    totals = toks.select(
        "__id__",
        F.greatest(F.size("__w__") - window + 1, F.lit(0)).alias("n_windows"),
    )
    removed = (
        _removed_windows(toks, window, hash_fn)
        .groupBy("__id__")
        .agg(F.count(F.lit(1)).alias("n_duplicate_windows"))
    )
    return (
        df.select(F.col(id_col).alias("__id__"))
        .join(totals, "__id__", "left")
        .join(removed, "__id__", "left")
        .select(
            F.col("__id__").alias(id_col),
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_duplicate_windows", F.lit(0))
            .cast("long")
            .alias("n_duplicate_windows"),
        )
    )


def remove_duplicate_substrings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 15,
    hash_fn: str = "xxhash64",
    out_col: str | None = None,
) -> DataFrame:
    """Rewrite ``text_col`` with every non-keeper duplicated span's
    tokens removed (whitespace-normalized), plus an
    ``n_tokens_removed`` count. Documents shorter than ``window``
    tokens pass through (normalized) untouched."""
    out_col = out_col or text_col
    toks = _tokens(df, text_col, id_col)
    tokens = toks.select(
        "__id__",
        F.posexplode("__w__").alias("__i0__", "__tok__"),
    ).select("__id__", (F.col("__i0__") + 1).alias("idx"), "__tok__")
    covered = (
        _removed_windows(toks, window, hash_fn)
        .select(
            "__id__",
            F.explode(F.sequence("pos", F.col("pos") + window - 1)).alias("idx"),
        )
        .distinct()
    )
    rebuilt = (
        tokens.join(covered, ["__id__", "idx"], "left_anti")
        .groupBy("__id__")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "__tok__"))),
                    lambda s: s["__tok__"],
                ),
            ).alias("__clean__"),
            F.count(F.lit(1)).alias("__n_kept__"),
        )
    )
    orig_counts = toks.select("__id__", F.size("__w__").alias("__n_orig__"))
    other_cols = [c for c in df.columns if c not in (text_col,)]
    return (
        df.withColumn("__id__", F.col(id_col))
        .join(rebuilt, "__id__", "left")
        .join(orig_counts, "__id__", "left")
        .select(
            *other_cols,
            # a fully-covered doc legitimately becomes ''; a doc that
            # was blank/whitespace stays ''
            F.coalesce("__clean__", F.lit("")).alias(out_col),
            (
                F.coalesce("__n_orig__", F.lit(0))
                - F.coalesce("__n_kept__", F.lit(0))
            )
            .cast("long")
            .alias("n_tokens_removed"),
        )
    )
