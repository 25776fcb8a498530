"""Line-level exact deduplication (the C4 / RefinedWeb corpus-prep
step): a line of text that occurs in many documents — boilerplate
navigation, cookie banners, license headers — is kept only in the
document where it first occurs and removed everywhere else.

Semantics:

* documents are split on ``\\n``; each (doc, position) line occurrence
  competes globally;
* the *keeper* of a line is the occurrence with the smallest
  ``(id, position)`` — deterministic, order-insensitive to partitioning;
* lines shorter than ``min_chars`` (after trim) are exempt — they are
  too short to be meaningful boilerplate and deduplicating them would
  shred normal prose ("Yes.", list bullets);
* surviving lines are reassembled in original order with ``\\n``.

Scale design (100 TB): the dedup shuffle is driven by
``xxhash64(line)`` — the keeper election groups (hash, id, pos) tuples,
so the wide exchange carries an 8-byte key plus two ids, never the line
text itself. The reassembly aggregation groups by document id — the
same key the input is usually already bucketed by. Hash collisions can
merge two distinct lines (losing one), the identical, industry-standard
trade exact_dedup makes for fingerprints; at 64-bit, ~10¹⁰ distinct
lines give a collision probability below 1%.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_chars: int = 10,
) -> DataFrame:
    """Remove duplicated lines across the corpus, keeping the first
    occurrence by ``(id, line position)``. Returns the input columns
    with ``text_col`` rewritten plus ``n_lines_kept`` / ``n_lines_removed``.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos__", "__line__"),
    )
    dedupable = F.length(F.trim(F.col("__line__"))) >= F.lit(min_chars)
    hashed = lines.withColumn(
        "__h__", F.when(dedupable, F.xxhash64("__line__"))
    )
    # keeper election: min (id, pos) per line hash — narrow shuffle of
    # (hash, id, pos); map-side partial aggregation applies
    keepers = (
        hashed.filter(F.col("__h__").isNotNull())
        .groupBy("__h__")
        .agg(F.min(F.struct(F.col(id_col), F.col("__pos__"))).alias("__k__"))
        .select(
            F.col("__h__"),
            F.col("__k__").getField(id_col).alias("__kid__"),
            F.col("__k__.__pos__").alias("__kpos__"),
        )
    )
    # keepers is O(distinct lines) — same order as the corpus, so this is
    # a plain hash join on the 8-byte hash, not a broadcast
    kept = hashed.join(keepers, "__h__", "left").filter(
        F.col("__h__").isNull()
        | ((F.col(id_col) == F.col("__kid__")) & (F.col("__pos__") == F.col("__kpos__")))
    )
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__pos__"), F.col("__line__")))
                    ),
                    lambda s: s.getField("__line__"),
                ),
                "\n",
            ).alias("__text__"),
            F.count(F.lit(1)).alias("n_lines_kept"),
        )
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("__total__"))
    out_cols = [c for c in df.columns if c != text_col]
    return (
        df.drop(text_col)
        .join(rebuilt, id_col, "left")
        .join(totals, id_col, "left")
        .select(
            *out_cols,
            F.coalesce(F.col("__text__"), F.lit("")).alias(text_col),
            F.coalesce(F.col("n_lines_kept"), F.lit(0)).alias("n_lines_kept"),
            (F.coalesce(F.col("__total__"), F.lit(0)) - F.coalesce(F.col("n_lines_kept"), F.lit(0))).alias(
                "n_lines_removed"
            ),
        )
    )


def duplicate_line_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_chars: int = 10,
    top_n: int = 20,
) -> DataFrame:
    """The most-duplicated lines in the corpus (boilerplate audit):
    ``line, n_occurrences, n_docs``. Only lines ≥ ``min_chars`` after
    trim are counted. The aggregation carries the line text, but only
    for lines that *are* duplicated and only ``top_n`` reach the driver.
    """
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "\n")).alias("__line__"),
    ).filter(F.length(F.trim(F.col("__line__"))) >= F.lit(min_chars))
    return (
        lines.groupBy("__line__")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct(F.col(id_col)).alias("n_docs"),
        )
        .filter(F.col("n_occurrences") > 1)
        .select(
            F.col("__line__").alias("line"),
            "n_occurrences",
            "n_docs",
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("line"))
        .limit(top_n)
    )
