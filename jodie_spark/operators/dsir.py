"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
public paper arXiv:2302.03169): select raw-corpus documents whose
hashed n-gram distribution looks like a small TARGET corpus.

Per document, the importance log-weight is

    log w(x) = Σ_f  [ log p̂_target(b(f)) − log p̂_raw(b(f)) ]

over the document's unigram+bigram features f, where ``b`` hashes
features into ``n_buckets`` and each p̂ is the Laplace-smoothed bucket
distribution of its corpus. Resampling takes the top-n by
``log w + Gumbel noise`` — the Gumbel-top-k trick samples WITHOUT
replacement ∝ softmax(log w); the noise here is a deterministic pure
function of the document id (same affine scatter as
``jodie_spark.operators.sampling``), so the selected set is
reproducible across cluster sizes and engines.

Scale shape (100 TB): the corpus shuffles only (id, bucket) pairs —
text never leaves the scan stage; both bucket tables are ``n_buckets``
rows, aggregated with map-side partial combine and then BROADCAST back
onto the pair stream; the final top-n is TakeOrderedAndProject (no
full sort). Everything is built-in expressions — md5 bucket hash and
exact-integer Gumbel uniforms — so a SQL oracle can replicate scores
value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jodie_spark.functions.text import ws_tokens
from jodie_spark.operators.classifier import hashed_token_bucket
from jodie_spark.operators.sampling import _K, _M, _P


def _ngram_features(col: Column) -> Column:
    """Unigrams + space-joined bigrams of whitespace tokens — the
    hashed n-gram feature set the DSIR paper uses."""
    toks = ws_tokens(col)
    # struct-wrap so the token array reaches the lambdas as a variable
    # (an inlined expression would re-tokenize once per gram); guard
    # size<2 explicitly — sequence(1, 0) DESCENDS through 0, which is
    # an invalid slice start
    grams = F.transform(
        F.array(F.struct(toks.alias("w"))),
        lambda s: F.when(
            F.size(s["w"]) < 2, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(s["w"]) - 1, F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice(s["w"], i, 2)),
            )
        ),
    )[0]
    return F.concat(toks, grams)


def _bucket_pairs(
    df: DataFrame, text_col: str, id_cols: list[str], n_buckets: int
) -> DataFrame:
    return df.select(
        *id_cols, F.explode(_ngram_features(F.col(text_col))).alias("__f__")
    ).select(*id_cols, hashed_token_bucket(F.col("__f__"), n_buckets).alias("bucket"))


def _bucket_log_probs(
    df: DataFrame, text_col: str, n_buckets: int, alpha: float, out: str
) -> DataFrame:
    """(bucket, log p̂) for one corpus: Laplace-smoothed over the
    corpus's total feature count. Rows exist only for OBSERVED buckets;
    unobserved buckets take the smoothing floor at join time."""
    counts = (
        _bucket_pairs(df, text_col, [], n_buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("__n__"))
    )
    total = counts.agg(
        F.sum("__n__").alias("__t__"), F.count(F.lit(1)).alias("__seen__")
    )
    return counts.crossJoin(F.broadcast(total)).select(
        "bucket",
        F.log(
            (F.col("__n__") + F.lit(float(alpha)))
            / (F.col("__t__") + F.lit(float(alpha)) * n_buckets)
        ).alias(out),
        F.log(
            F.lit(float(alpha)) / (F.col("__t__") + F.lit(float(alpha)) * n_buckets)
        ).alias(out + "_floor"),
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-raw-document DSIR importance log-weight: ``(id_col,
    log_weight)``. Documents with no features weigh 0 (empty product).

    The two n_buckets-row log-prob tables broadcast onto the raw
    corpus's (id, bucket) stream; the only corpus-sized shuffle is the
    per-document sum aggregation (map-side combined)."""
    t_probs = _bucket_log_probs(target, text_col, n_buckets, alpha, "__lt__")
    r_probs = _bucket_log_probs(raw, text_col, n_buckets, alpha, "__lr__")
    pairs = _bucket_pairs(raw, text_col, [id_col], n_buckets)
    # floors are scalar per corpus; carry them via the broadcast rows
    # (coalesce handles buckets unseen in one corpus but seen in the other)
    t_floor = t_probs.select(F.first("__lt___floor").alias("__tf__")).limit(1)
    r_floor = r_probs.select(F.first("__lr___floor").alias("__rf__")).limit(1)
    scored = (
        pairs.join(F.broadcast(t_probs.select("bucket", "__lt__")), "bucket", "left")
        .join(F.broadcast(r_probs.select("bucket", "__lr__")), "bucket", "left")
        .crossJoin(F.broadcast(t_floor))
        .crossJoin(F.broadcast(r_floor))
        .select(
            id_col,
            (
                F.coalesce(F.col("__lt__"), F.col("__tf__"))
                - F.coalesce(F.col("__lr__"), F.col("__rf__"))
            ).alias("__d__"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(F.sum("__d__").alias("log_weight"))
    # empty/feature-less documents: weight 0
    return (
        raw.select(id_col)
        .join(per_doc, id_col, "left")
        .select(id_col, F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"))
    )


def gumbel_noise(id_col: Column, salt: int = 0) -> Column:
    """Deterministic standard-Gumbel noise from the affine scatter of
    the id: u = (bucket + 0.5) / 2^20 ∈ (0, 1), g = −log(−log u).
    Exact-integer bucket arithmetic ⇒ identical in any ANSI engine."""
    r = F.pmod(id_col.cast("long") + F.lit(salt), F.lit(_P))
    bucket = F.pmod(r * F.lit(_K), F.lit(_M))
    u = (bucket.cast("double") + F.lit(0.5)) / F.lit(float(_M))
    return -F.log(-F.log(u))


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 1.0,
    temperature: float = 1.0,
    salt: int = 0,
) -> DataFrame:
    """Select ``n`` raw documents ∝ softmax(log_weight / temperature)
    WITHOUT replacement via Gumbel-top-k; deterministic in (data,
    salt). Returns the selected rows with their ``log_weight``."""
    lw = dsir_log_weights(raw, target, text_col, id_col, n_buckets, alpha)
    keyed = lw.select(
        id_col,
        "log_weight",
        (F.col("log_weight") / F.lit(float(temperature))
         + gumbel_noise(F.col(id_col), salt)).alias("__gumbel_key__"),
    )
    picked = keyed.orderBy(F.col("__gumbel_key__").desc(), F.col(id_col)).limit(n)
    return raw.join(
        picked.select(id_col, "log_weight"), id_col, "inner"
    )
