"""Full-text search over a document corpus: term postings (inverted
index), boolean keyword search, and BM25 ranking.

Beyond-reference operator family (the reference — mrpowers-io/jodie —
has no search surface; this follows its utility-function style:
`DeltaHelpers.scala:479-492` plain DataFrame-in/DataFrame-out).

Scale shape (100 TB):

- The **query path never builds the full index**: tokens are filtered
  to the query's terms *before* any aggregation, so the shuffle
  carries only matching (doc_id, term) rows — a tiny fraction of the
  corpus — and Catalyst collapses tokenize+filter into the scan
  projection (single pass over ``text``).
- Corpus-level constants (N, avgdl) are one aggregate row, joined in
  by broadcast-crossJoin — no driver round-trip inside the plan.
- Document frequencies for the query terms are |terms| rows —
  broadcast-joined against the per-doc TF table.
- Top-k is ``orderBy(...).limit(k)`` → ``TakeOrderedAndProject``
  (per-partition heaps, no global sort).
- The **persisted index path** (`build_inverted_index`) is for
  repeated querying: one explode + one (term, doc_id) hash aggregation
  (map-side combine bounds the shuffle at distinct pairs), written as
  a Delta table partitioned by a hash bucket of the term so a query
  prunes to |terms| buckets.

Everything is Catalyst expressions — no UDFs anywhere.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jodie_spark.functions.text import _words

__all__ = [
    "term_postings",
    "build_inverted_index",
    "keyword_search",
    "bm25_topk",
    "tokenize_query",
]


def tokenize_query(query: str) -> list[str]:
    """Driver-side tokenization of a query string with the SAME
    semantics as :func:`jodie_spark.functions.text._words` (lower-cased
    runs of Unicode letters): ``[^\\W\\d_]+`` ≡ ``\\p{L}+``. Duplicate
    terms are dropped (BM25 treats the query as a set)."""
    seen: dict[str, None] = {}
    for t in re.findall(r"[^\W\d_]+", query.lower(), re.UNICODE):
        seen.setdefault(t)
    return list(seen)


def term_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Posting rows ``(term, doc_id, tf)`` — the exploded inverted
    index. One explode + one hash aggregation; the shuffle carries
    distinct (term, doc) pairs (map-side combine), never raw tokens."""
    toks = df.select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("term")
    )
    return toks.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))


def build_inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Compact inverted index: one row per term with its document
    frequency and doc_id-sorted postings array, plus a stable hash
    bucket column to partition a persisted copy by (a query for k
    terms then prunes to ≤k of ``n_buckets`` partitions):

        index = build_inverted_index(docs)
        write_delta(index, path, partition_by=["bucket"])
    """
    postings = term_postings(df, text_col, id_col)
    return postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
        F.array_sort(
            F.collect_list(F.struct(F.col(id_col), F.col("tf")))
        ).alias("postings"),
    ).withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))


def _doc_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, dl, term) rows: one generator per doc alongside its
    document length, computed in a single projection over ``text``."""
    w = _words(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(w).alias("__dl__"),
        F.explode(w).alias("term"),
    )


def keyword_search(
    df: DataFrame,
    terms: list[str] | str,
    mode: str = "all",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Boolean search: docs matching ``all`` (AND) or ``any`` (OR) of
    the terms. Returns ``(doc_id, n_matched)`` where ``n_matched`` is
    the number of *distinct* query terms present.

    Plan: tokenize → filter to query terms (inside the scan stage) →
    one distinct-count aggregation on doc_id. No joins."""
    if isinstance(terms, str):
        terms = tokenize_query(terms)
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any', got {mode!r}")
    if not terms:
        raise ValueError("keyword_search requires at least one term")
    toks = df.select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("term")
    ).filter(F.col("term").isin(terms))
    hits = toks.groupBy(id_col).agg(
        F.count_distinct("term").alias("n_matched")
    )
    if mode == "all":
        hits = hits.filter(F.col("n_matched") == len(terms))
    return hits


def bm25_topk(
    df: DataFrame,
    query: str | list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k: ``(doc_id, score)`` for the ``k`` best
    documents, score rounded to 6 decimals (ties broken by doc_id
    ascending so results are engine-portable).

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))   (Lucene variant —
    always positive, so stop-word-heavy queries can't flip signs)

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Shuffle budget: one (doc, term) aggregation over *query-filtered*
    tokens, one |terms|-row DF aggregation (broadcast back), one final
    per-doc sum, then TakeOrderedAndProject. Corpus constants (N,
    avgdl over ALL docs, empty ones included) ride a broadcast
    crossJoin of a 1-row aggregate."""
    terms = tokenize_query(query) if isinstance(query, str) else list(query)
    if not terms:
        raise ValueError("bm25_topk requires a non-empty query")

    toks = _doc_tokens(df, text_col, id_col).filter(F.col("term").isin(terms))

    # per-(doc, term) frequency; dl is constant per doc so first() is exact
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("__dl__").alias("dl")
    )
    # document frequency per query term (|terms| rows → broadcast)
    dft = toks.groupBy("term").agg(F.count_distinct(id_col).alias("dft"))
    # corpus constants: 1 row, broadcast into the scoring join
    stats = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(_words(F.col(text_col)))).alias("avgdl"),
    )

    scored = (
        tf.join(F.broadcast(dft), "term")
        .join(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("dft") + F.lit(0.5))
                / (F.col("dft") + F.lit(0.5))
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("dl") / F.col("avgdl")
                )
            ),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
