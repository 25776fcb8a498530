"""Distributed byte-pair-encoding (BPE) vocabulary training — the
subword-tokenizer trainer a large-scale pretraining pipeline runs
before :mod:`jodie_spark.operators.tokenize` encodes the corpus.

Beyond-reference operator family (the reference has no text surface);
follows its DataFrame-in/DataFrame-out style (cf.
``DeltaHelpers.scala`` operator conventions).

Algorithm (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units"): start from characters plus an end-of-word
marker, repeatedly count adjacent symbol pairs weighted by word
frequency, merge the most frequent pair everywhere, repeat. Merges are
greedy leftmost non-overlapping — ``a a a a`` with rule ``(a, a)``
becomes ``aa aa`` — which the fold below reproduces exactly (a freshly
merged token can never be the left side of another merge in the same
pass because its spelling is the concatenation, not the left part).

Scale shape — the property that makes this viable at 100 TB:
- ONE corpus-scale aggregation (word → count, map-side combined) at
  the start; every subsequent stage is bounded by |vocab| (distinct
  words), never by corpus size. This is exactly how fastBPE /
  sentencepiece shard their trainers.
- Each merge iteration is: adjacent-pair explode over the |vocab|-row
  words table → one map-side-combined sum → ``orderBy().limit(1)``
  (TakeOrderedAndProject, no global sort) → a 1-row collect. The
  shuffle carries (symbol-pair, partial count) rows; the driver holds
  one merge rule per iteration, never the words table.
- The symbol rewrite is a Catalyst ``aggregate`` fold (whole-stage
  codegen, no UDF); each iteration's result is cached and the previous
  iteration unpersisted so lineage stays one fold deep.

Determinism: pair counts are integers; ties break (count desc, left
asc, right asc). Given the same corpus and parameters the merge table
is bit-identical in any engine — the DuckDB oracle unrolls the same
iterations in SQL (``list_reduce`` over the same fold).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bpe_word_counts", "bpe_train", "bpe_apply_merges", "END_OF_WORD"]

END_OF_WORD = "</w>"


def bpe_word_counts(
    df: DataFrame,
    text_col: str = "text",
    pattern: str = "[a-z]+",
    top_words: int | None = None,
) -> DataFrame:
    """``(word, cnt)`` frequency table — the ONLY corpus-scale stage of
    BPE training. ``pattern`` extracts words from lowercased text;
    ``top_words`` keeps a deterministic head (count desc, word asc) so
    small-scale runs are oracle-reproducible. At full scale leave
    ``top_words=None``: the table is |vocab|-bounded already."""
    # pattern as a literal ARGUMENT, never interpolated into SQL text —
    # a quote/backslash in a user pattern must not become plan injection
    words = df.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pattern), 0)
        ).alias("word")
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    if top_words is not None:
        counts = counts.orderBy(F.desc("cnt"), "word").limit(top_words)
    return counts


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Greedy leftmost non-overlapping merge of ``(left, right)`` in a
    symbol array, as a pure Catalyst ``aggregate`` fold: seed with the
    first symbol, then either fuse the incoming symbol into the
    accumulator's tail (when tail == left and incoming == right) or
    append it. A just-fused token spells ``left+right`` so it cannot
    match ``left`` again — that is what makes the fold non-overlapping."""
    merged = left + right
    return F.aggregate(
        F.slice(syms, 2, F.size(syms) - 1),
        F.slice(syms, 1, 1),
        lambda acc, s: F.when(
            (F.element_at(acc, -1) == F.lit(left)) & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    words: DataFrame,
    n_merges: int,
    word_col: str = "word",
    count_col: str = "cnt",
    end_of_word: str | None = END_OF_WORD,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merge rules from a ``(word, count)``
    table. Returns ``(merges, segmented)`` where ``merges`` is
    ``[(step, lhs, rhs, pair_count), ...]`` (step starting at 1) and
    ``segmented`` is the words table with a ``syms`` array column in
    its final segmentation.

    Distributed by construction: the words table never leaves the
    executors; the driver sees one (lhs, rhs, count) row per
    iteration. Stops early when no adjacent pair remains."""
    syms = F.split(F.col(word_col), "")
    if end_of_word is not None:
        syms = F.concat(syms, F.array(F.lit(end_of_word)))
    cur = words.select(
        syms.alias("syms"), F.col(count_col).cast("long").alias("cnt")
    ).cache()

    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        pairs = cur.select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, F.size("syms") - 1),
                    F.slice("syms", 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("pair_cnt"))
            .orderBy(F.desc("pair_cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, pair_cnt = best[0]
        merges.append((step, left, right, int(pair_cnt)))
        nxt = cur.select(_merge_fold(F.col("syms"), left, right).alias("syms"), "cnt")
        nxt = nxt.cache()
        nxt.count()  # materialize before dropping the parent cache
        cur.unpersist()
        cur = nxt
    return merges, cur


def bpe_apply_merges(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "tokens",
    pattern: str = "[a-z]+",
    end_of_word: str | None = END_OF_WORD,
) -> DataFrame:
    """Tokenize text with a learned merge table: extract words, split
    to characters (+ end-of-word marker), apply every merge rule in
    learned order, flatten. Pure Catalyst expressions — the merge
    table folds into the plan as literals, so encoding shuffles
    nothing and broadcasts nothing.

    For efficiency on a real corpus, encode DISTINCT words and join
    back (words repeat; the fold is per distinct word) — here the
    rules are applied inline per row, which is the right shape when
    the caller has already deduplicated words or the corpus is wide."""
    rules = [(m[-3], m[-2]) if len(m) >= 3 else (m[0], m[1]) for m in merges]
    syms = lambda w: (  # noqa: E731
        F.concat(F.split(w, ""), F.array(F.lit(end_of_word)))
        if end_of_word is not None
        else F.split(w, "")
    )

    def encode_word(w: Column) -> Column:
        acc = syms(w)
        for left, right in rules:
            acc = _merge_fold(acc, left, right)
        return acc

    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pattern), 0)
    return df.withColumn(out_col, F.flatten(F.transform(words, encode_word)))
