"""Perplexity-based quality filtering (the CCNet / LLaMA data-prep
step): score every document by how "language-like" it is under a
language model and filter or bucket on the score. Real pipelines use a
KenLM n-gram model; the same mechanics with a corpus-trained unigram
model are implemented here EXACTLY — smoothing, UNK handling, the
explode→join→aggregate plan — so swapping in externally-trained n-gram
probabilities is a one-table change (pass your own ``model``).

Everything is pure DataFrame algebra — tokenize (explode), probability
lookup (join against the model table), per-document average (groupBy) —
no Python in the hot path, and the whole computation is reproducible
token-for-token in any SQL engine (the DuckDB oracle does).

Scale notes: the model table is ``|vocab|`` rows — broadcast when it
fits (the default assumption: even a 10 M-token vocab of (token,
logp) is ~200 MB), otherwise drop the hint and Spark shuffles on the
token hash. Training aggregates token counts (one shuffle) and brings
back only the two scalars (total count, vocab size) via a 1-row cross
join, never the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jodie_spark.functions.text import ws_tokens


def unigram_model(df: DataFrame, text_col: str, k: float = 1.0) -> DataFrame:
    """Train an add-``k``-smoothed unigram model on the corpus.
    Returns ``(token, logp)`` plus the model scalars ``total`` and
    ``vocab`` repeated per row (so a saved model is self-contained).
    ``P(t) = (count(t) + k) / (total + k * (vocab + 1))`` — the ``+1``
    reserves mass for the UNK token."""
    counts = (
        df.select(F.explode(ws_tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("__c__"))
    )
    totals = counts.agg(
        F.sum("__c__").cast("double").alias("total"),
        F.count(F.lit(1)).cast("double").alias("vocab"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "token",
            F.log((F.col("__c__") + F.lit(float(k))) /
                  (F.col("total") + F.lit(float(k)) * (F.col("vocab") + 1))).alias("logp"),
            "total",
            "vocab",
        )
    )


def perplexity_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    model: DataFrame | None = None,
    k: float = 1.0,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document ``(id, n_tokens, avg_logprob, perplexity)`` under
    the (given or corpus-trained) unigram model. Out-of-vocabulary
    tokens get the UNK probability ``k / (total + k * (vocab + 1))``.
    Empty documents score NULL. Filter on ``perplexity`` ascending for
    quality (low = language-like under the model)."""
    if model is None:
        model = unigram_model(df, text_col, k)
    scalars = model.select("total", "vocab").limit(1)
    m = model.select("token", "logp")
    if broadcast_model:
        m = F.broadcast(m)
    toks = df.select(
        F.col(id_col), F.explode(ws_tokens(F.col(text_col))).alias("token")
    )
    unk = F.log(
        F.lit(float(k)) / (F.col("total") + F.lit(float(k)) * (F.col("vocab") + 1))
    )
    scored = (
        toks.join(m, "token", "left")
        .crossJoin(F.broadcast(scalars))
        .select(F.col(id_col), F.coalesce(F.col("logp"), unk).alias("__lp__"))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg("__lp__").alias("avg_logprob"),
    )
    # left join back so token-less documents appear with NULL scores
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.col("avg_logprob"),
            F.exp(-F.col("avg_logprob")).alias("perplexity"),
        )
    )


def _token_pairs(df: DataFrame, text_col: str, id_col: str | None) -> DataFrame:
    """(prev, token) rows per document position — the first token's
    context is the sentence-start marker ``<s>``. Pure Catalyst: one
    ``transform`` over the token array (no self-join, no shuffle)."""
    base = df.withColumn("__w__", ws_tokens(F.col(text_col))).filter(
        F.size("__w__") > 0
    )
    pair_expr = F.explode(
        F.expr(
            "transform(__w__, (t, i) -> struct("
            "CASE WHEN i = 0 THEN '<s>' ELSE element_at(__w__, i) END AS prev,"
            " t AS token))"
        )
    ).alias("pr")
    cols = ([F.col(id_col)] if id_col else []) + [pair_expr]
    return base.select(*cols).select(
        *(([id_col] if id_col else []) + ["pr.prev", "pr.token"])
    )


def bigram_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus bigram table ``(prev, token, c_pt)`` with ``<s>``-anchored
    first tokens. One explode + one hash aggregation (shuffle bounded
    by distinct bigrams, map-side combined)."""
    return (
        _token_pairs(df, text_col, None)
        .groupBy("prev", "token")
        .agg(F.count(F.lit(1)).alias("c_pt"))
    )


def bigram_perplexity_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lam: float = 0.7,
    k: float = 1.0,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document perplexity under an interpolated bigram model
    trained on the corpus itself:

        P(t | p) = λ · P_bi(t | p) + (1 − λ) · P_uni(t)
        P_bi(t|p) = (c(p,t) + k) / (c(p) + k·(V + 1))
        P_uni(t)  = (c(t) + k) / (total + k·(V + 1))

    Unseen bigrams back off smoothly (k mass), unseen contexts give the
    uniform 1/(V+1), and out-of-vocabulary tokens take the UNK unigram
    mass — every branch is the same ``coalesce(count, 0)`` arithmetic,
    so the whole model is reproducible in any SQL engine.

    Captures word-order signal unigram perplexity can't: a shuffled
    document keeps its unigram score but its bigram perplexity rises.
    Same plan shape as :func:`perplexity_score` — explode, two model
    joins (broadcast when the bigram table fits), one aggregation."""
    uni = unigram_model(df, text_col, k)
    scalars = uni.select("total", "vocab").limit(1)
    bi = bigram_counts(df, text_col)
    ctx = bi.groupBy("prev").agg(F.sum("c_pt").alias("c_p"))
    uni_m = uni.select("token", F.exp("logp").alias("p_uni"))
    if broadcast_model:
        bi, ctx, uni_m = F.broadcast(bi), F.broadcast(ctx), F.broadcast(uni_m)

    pairs = _token_pairs(df, text_col, id_col)
    kk = F.lit(float(k))
    v1 = F.col("vocab") + 1
    unk_uni = kk / (F.col("total") + kk * v1)
    scored = (
        pairs.join(bi, ["prev", "token"], "left")
        .join(ctx, "prev", "left")
        .join(uni_m, "token", "left")
        .crossJoin(F.broadcast(scalars))
        .select(
            F.col(id_col),
            F.log(
                F.lit(float(lam))
                * (F.coalesce(F.col("c_pt"), F.lit(0)) + kk)
                / (F.coalesce(F.col("c_p"), F.lit(0)) + kk * v1)
                + F.lit(1.0 - float(lam)) * F.coalesce(F.col("p_uni"), unk_uni)
            ).alias("__lp__"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg("__lp__").alias("avg_logprob"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.col("avg_logprob"),
            F.exp(-F.col("avg_logprob")).alias("perplexity"),
        )
    )


def perplexity_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_perplexity: float,
    model: DataFrame | None = None,
    k: float = 1.0,
) -> DataFrame:
    """Keep documents whose perplexity under the model is at most
    ``max_perplexity`` (the CCNet head/middle cut). Token-less
    documents are dropped (no evidence of language)."""
    scores = perplexity_score(df, text_col, id_col, model=model, k=k)
    keep = scores.filter(
        F.col("perplexity").isNotNull() & (F.col("perplexity") <= max_perplexity)
    ).select(id_col)
    return df.join(keep, id_col, "left_semi")
