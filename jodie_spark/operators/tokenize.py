"""Vocabulary-based corpus encoding: the last step of a training-data
pipeline — turn cleaned documents into token-id sequences against a
frequency-ranked vocabulary.

Beyond-reference operator family (the reference has no text surface);
follows its DataFrame-in/DataFrame-out style.

Scale shape: vocabulary build is ONE token-count aggregation (map-side
combined, shuffle bounded by |vocab|) + a rank window over the vocab
table only (|vocab| rows, not |tokens|); encoding is explode → one
broadcast join against the vocab (id lookup never shuffles the corpus)
→ optional per-document reassembly keyed on doc id. Everything is
Catalyst expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jodie_spark.functions.text import ws_tokens

__all__ = ["build_vocab", "encode_documents", "decode_token_ids"]

UNK_ID = 0


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    max_size: int | None = None,
    min_count: int = 1,
) -> DataFrame:
    """Frequency-ranked vocabulary ``(token, token_id, n_occurrences)``.

    Ids are deterministic: 1..N by count descending then token
    ascending (id 0 is reserved for UNK). ``max_size`` keeps the most
    frequent tokens; ``min_count`` drops the long tail. The rank window
    runs over the |vocab|-row count table — never over raw tokens."""
    counts = (
        df.select(F.explode(ws_tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token"))
    vocab = counts.withColumn("token_id", F.row_number().over(w))
    if max_size is not None:
        vocab = vocab.filter(F.col("token_id") <= max_size)
    return vocab.select("token", "token_id", "n_occurrences")


def encode_documents(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    exploded: bool = False,
) -> DataFrame:
    """Encode documents against ``vocab``: out-of-vocabulary tokens get
    ``UNK_ID`` (0).

    Returns ``(doc_id, token_ids array<int>, n_tokens, n_unk)`` —
    or, with ``exploded=True``, position-level rows ``(doc_id, pos,
    token, token_id)`` (the engine-portable form: scalar columns only).

    Plan: posexplode (keeps token order) → broadcast vocab join →
    per-doc reassembly via sorted collect of (pos, id) structs; the
    corpus shuffles once, on the doc id."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(ws_tokens(F.col(text_col))).alias("pos", "token"),
    )
    looked = toks.join(F.broadcast(vocab.select("token", "token_id")), "token", "left")
    looked = looked.withColumn(
        "token_id", F.coalesce(F.col("token_id"), F.lit(UNK_ID))
    )
    if exploded:
        return looked.select(id_col, "pos", "token", "token_id")
    assembled = looked.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "token_id"))),
            lambda s: s["token_id"],
        ).alias("token_ids"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum((F.col("token_id") == UNK_ID).cast("long")).alias("n_unk"),
    )
    # token-less documents appear with empty sequences
    return (
        df.select(id_col)
        .join(assembled, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("token_ids"), F.array().cast("array<int>")).alias(
                "token_ids"
            ),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("n_unk"), F.lit(0)).alias("n_unk"),
        )
    )


def decode_token_ids(
    encoded: DataFrame,
    vocab: DataFrame,
    ids_col: str = "token_ids",
    id_col: str = "doc_id",
    unk_token: str = "<unk>",
) -> DataFrame:
    """Inverse of :func:`encode_documents`: ``(doc_id, text)`` with
    OOV positions rendered as ``unk_token``. Same explode + broadcast
    join + ordered reassembly shape."""
    pos = encoded.select(
        F.col(id_col), F.posexplode(F.col(ids_col)).alias("pos", "token_id")
    )
    joined = pos.join(
        F.broadcast(vocab.select("token", "token_id")), "token_id", "left"
    ).withColumn("token", F.coalesce(F.col("token"), F.lit(unk_token)))
    return (
        joined.groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "token"))),
                    lambda s: s["token"],
                ),
            ).alias("text")
        )
    )
