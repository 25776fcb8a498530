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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jodie_spark.functions.text import _words, with_text_stats
from jodie_spark.operators.text_dedup import minhash_dedup


def token_frequencies(
    df: DataFrame, text_col: str = "text", top_k: int | None = None
) -> DataFrame:
    """Corpus vocabulary: (token, n_occurrences) — explode + one hash
    aggregation (map-side combine keeps the shuffle at |vocab|, not
    |tokens|). ``top_k`` adds a deterministic count-desc/token-asc
    per-partition top-k + merge."""
    tokens = df.select(F.explode(_words(F.col(text_col))).alias("token"))
    freq = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("n_occurrences"))
    if top_k:
        freq = freq.orderBy(F.col("n_occurrences").desc(), F.col("token")).limit(top_k)
    return freq


def corpus_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus summary: doc count, token count, char count, mean
    quality, distinct fingerprints (near-exact content variety). One
    scan, one aggregation."""
    scored = with_text_stats(df, text_col)
    return scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum(F.length(F.col(text_col))).cast("long").alias("n_chars"),
        F.round(F.avg("quality"), 6).alias("mean_quality"),
        F.countDistinct("fingerprint").alias("n_distinct_fingerprints"),
    )


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
    # keeper election via groupBy + min_by (not a row_number window):
    # one scan (the text-stats projection runs once), one shuffle, and
    # map-side combine absorbs hot fingerprints (crawl boilerplate
    # duplicated millions of times) before they move
    cols = gated.columns
    deduped = (
        gated.groupBy(F.col("fingerprint").alias("__fp__"))
        .agg(
            F.min_by(
                F.struct(*[F.col(c) for c in cols]), F.col(id_col)
            ).alias("__row__")
        )
        .select("__row__.*")
    )
    if fuzzy:
        deduped = minhash_dedup(deduped, text_col, id_col, **(fuzzy_kwargs or {}))
    return deduped


def select_token_budget(
    df: DataFrame,
    budget: int,
    quality_col: str = "quality",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Highest-quality documents whose cumulative token count fits a
    training BUDGET — the FineWeb/DataComp selection shape ("take the
    best N tokens"), made deterministic and exact.

    Documents are ordered (quality desc, id asc — the id tiebreak makes
    equal-quality runs reproducible) and kept while their EXCLUSIVE
    running token total is below ``budget``; the straddling document is
    included, so the selection meets the budget with at most one
    document of overshoot. The running total is the same two-phase
    distributed prefix sum ``pack_sequences`` uses
    (``packing.with_global_offsets``) — per-range-partition sums plus a
    #partitions-bounded offset collect, no single-partition window, no
    driver-side sort. Closed-form arithmetic throughout, so a SQL
    window oracle replicates the selection exactly.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    from jodie_spark.operators.packing import with_global_offsets

    # coalesce(-q, +inf): UNSCORED (NULL-quality) documents sort LAST —
    # a bare -q would sort them first and fill the training budget with
    # unscored docs (same convention as the dedup keeper election,
    # text_dedup.py; matches SQL's NULLS-LAST on ORDER BY quality DESC)
    ordered = df.withColumn(
        "__ord__",
        F.struct(
            F.coalesce(
                -F.col(quality_col).cast("double"), F.lit(float("inf"))
            ).alias("q"),
            F.col(id_col).alias("i"),
        ),
    )
    out = with_global_offsets(
        ordered, tokens_col, "__ord__", offset_col="__budget_off__"
    )
    return out.filter(F.col("__budget_off__") < F.lit(int(budget))).drop(
        "__ord__", "__budget_off__"
    )
