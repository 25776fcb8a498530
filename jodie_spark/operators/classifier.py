"""Hashed linear text classification for corpus quality filtering —
the fastText/CCNet pattern: train a cheap linear model on seed sets
(e.g. "wiki-like" vs "raw crawl"), then score every document at scan
speed and keep the high-scoring tail.

Design for 100 TB:
- The model is a (bucket → weight) table of at most ``n_buckets`` rows
  (KBs-MBs) — always broadcast; the corpus never shuffles for scoring.
- Scoring explodes (id, bucket) pairs only — two 8-byte longs — so the
  one aggregation shuffle carries ~16 bytes per token, never the text.
- Everything is built-in expressions (md5/conv/explode/agg): full
  whole-stage codegen, no Python in the hot path.
- The token→bucket hash is ``conv(substr(md5(token),1,8),16,10) %
  n_buckets`` — deliberately engine-portable (DuckDB:
  ``cast(concat('0x',substr(md5(t),1,8)) as ubigint)``), so both
  training and scoring are value-checkable by a SQL oracle.

Training is Naive-Bayes log-odds (one groupBy over exploded tokens,
no iterations — the right trade at corpus scale; fastText's logistic
loss buys little over NB log-odds for quality filtering):

    w_b  = ln((c1_b + a) / (C1 + a*B)) - ln((c0_b + a) / (C0 + a*B))
    bias = ln(N1 / N0)

where ``c{y}_b`` is the count of tokens hashing to bucket ``b`` in
class ``y``, ``C{y}`` total tokens, ``N{y}`` documents, ``a`` the
smoothing constant, ``B`` the bucket count. A document's score is
``sigmoid(bias + sum_t w_bucket(t))``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jodie_spark.functions.text import ws_tokens

DEFAULT_BUCKETS = 1 << 20


def hashed_token_bucket(col: Column, n_buckets: int = DEFAULT_BUCKETS) -> Column:
    """Engine-portable hash bucket of a token: first 8 hex chars of
    md5 as an integer, mod ``n_buckets``."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % n_buckets


def _exploded_buckets(
    df: DataFrame, text_col: str, id_cols: list[str], n_buckets: int
) -> DataFrame:
    """(id..., bucket) pairs, one per token occurrence — the narrow
    projection every stage here shuffles instead of the text."""
    return df.select(
        *id_cols, F.explode(ws_tokens(F.col(text_col))).alias("__tok__")
    ).select(*id_cols, hashed_token_bucket(F.col("__tok__"), n_buckets).alias("bucket"))


def train_nb_classifier(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
) -> tuple[DataFrame, float]:
    """Train Naive-Bayes log-odds weights from a labeled DataFrame
    (``label_col`` ∈ {0, 1}).

    Returns ``(weights, bias)`` — ``weights`` is a DataFrame
    ``(bucket: long, weight: double)`` containing only buckets seen in
    training (absent buckets implicitly weigh ``w_empty(b)``, which is
    0 under equal totals; see module docstring for the exact form).
    One explode + one groupBy; the label/total constants are a bounded
    4-row collect.
    """
    lab = F.col(label_col).cast("int")
    totals = {
        int(r["label"]): (int(r["docs"]), int(r["toks"]))
        for r in df.groupBy(lab.alias("label"))
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.size(ws_tokens(F.col(text_col)))).alias("toks"),
        )
        .collect()
    }
    if 0 not in totals or 1 not in totals:
        raise ValueError(f"training data must contain both labels; saw {sorted(totals)}")
    n0, c0 = totals[0]
    n1, c1 = totals[1]

    per_bucket = (
        _exploded_buckets(df, text_col, [label_col], n_buckets)
        .groupBy("bucket")
        .agg(
            F.sum(F.when(lab == 1, 1).otherwise(0)).alias("c1"),
            F.sum(F.when(lab == 0, 1).otherwise(0)).alias("c0"),
        )
    )
    denom1 = float(c1) + alpha * n_buckets
    denom0 = float(c0) + alpha * n_buckets
    weights = per_bucket.select(
        "bucket",
        (
            F.log((F.col("c1") + F.lit(float(alpha))) / F.lit(denom1))
            - F.log((F.col("c0") + F.lit(float(alpha))) / F.lit(denom0))
        ).alias("weight"),
    )
    import math

    return weights, math.log(n1 / n0)


def classifier_score(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    bias: float = 0.0,
) -> DataFrame:
    """Score documents with a (bucket, weight) model: returns
    ``(id_col, score)`` with ``score = sigmoid(bias + Σ w)``.

    The model side is broadcast; the corpus explodes to (id, bucket)
    longs only. Documents with no tokens score ``sigmoid(bias)``.
    """
    pairs = _exploded_buckets(df, text_col, [id_col], n_buckets)
    summed = (
        pairs.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("__s__"))
    )
    # left join back so token-less documents still get a score
    ids = df.select(id_col).distinct()
    return (
        ids.join(summed, id_col, "left")
        .select(
            id_col,
            (
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-(F.lit(float(bias)) + F.coalesce(F.col("__s__"), F.lit(0.0)))))
            ).alias("score"),
        )
    )


def with_classifier_score(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    bias: float = 0.0,
    score_col: str = "score",
) -> DataFrame:
    """``df`` plus a ``score_col`` column (join on ``id_col``)."""
    scores = classifier_score(df, weights, text_col, id_col, n_buckets, bias)
    return df.join(
        scores.withColumnRenamed("score", score_col), id_col, "left"
    )


def classifier_filter(
    df: DataFrame,
    weights: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    bias: float = 0.0,
) -> DataFrame:
    """Keep documents scoring ≥ ``threshold`` (the CCNet head/tail
    cut). Returns ``df``'s columns unchanged."""
    kept = with_classifier_score(
        df, weights, text_col, id_col, n_buckets, bias, score_col="__score__"
    ).filter(F.col("__score__") >= threshold)
    return kept.drop("__score__")
