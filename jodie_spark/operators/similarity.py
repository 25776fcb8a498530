"""Similarity search over an embedding column (``array<float>``).

Two paths, same contract as any vector store:

- **brute force** — exact cosine top-k: one projection + one top-k.
  The per-row dot product is ``zip_with``/``aggregate`` (JVM, codegen);
  a global ``orderBy(...).limit(k)`` lets Spark run per-partition
  top-k + a tiny final merge — no full sort materializes.
- **LSH-bucketed (ANN)** — sign-random-projection signatures over
  multiple tables; only rows sharing a signature with the query in at
  least one table are scored. At 100 TB this turns a full-corpus scan
  into a bucket probe; signatures can be precomputed and persisted as
  a column (see :func:`with_ann_signatures`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jodie_spark.functions.vectors import (
    cosine_similarity,
    random_hyperplane_signature,
    random_hyperplanes,
)


def brute_force_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: ``(id, similarity)`` sorted descending."""
    q = F.array(*[F.lit(float(x)) for x in query])
    return (
        df.select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col), q).alias("similarity"),
        )
        .orderBy(F.col("similarity").desc(), F.col(id_col))
        .limit(k)
    )


def with_ann_signatures(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: int = 12,
    n_tables: int = 3,
) -> DataFrame:
    """Attach the LSH signature columns (``__ann_sig{t}__``). Persist
    the result once and reuse it across queries — signature computation
    is the expensive half of every ANN probe."""
    out = df
    for t in range(n_tables):
        out = out.withColumn(
            f"__ann_sig{t}__",
            random_hyperplane_signature(F.col(vec_col), dim, n_planes, seed=42 + t),
        )
    return out


def ann_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 3,
) -> DataFrame:
    """Approximate cosine top-k: score only rows sharing an LSH bucket
    with the query in any table. Recall grows with ``n_tables`` and
    shrinks with ``n_planes``; 3×12 gives high recall at ~1/1000 of the
    corpus scored for uniform data. If the input already carries
    ``__ann_sig{t}__`` columns (from :func:`with_ann_signatures`) they
    are reused — the probe then touches no vector except candidates'.
    """
    import numpy as np

    qv = np.asarray(list(query), dtype="float64")
    sigs = df if f"__ann_sig0__" in df.columns else with_ann_signatures(
        df, vec_col, dim, n_planes, n_tables
    )
    cond = None
    for t in range(n_tables):
        planes = random_hyperplanes(dim, n_planes, seed=42 + t)
        qsig = int(sum((1 << i) for i, p in enumerate(planes) if float(p @ qv) >= 0))
        c = F.col(f"__ann_sig{t}__") == F.lit(qsig)
        cond = c if cond is None else (cond | c)
    q = F.array(*[F.lit(float(x)) for x in query])
    return (
        sigs.filter(cond)
        .select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col), q).alias("similarity"),
        )
        .orderBy(F.col("similarity").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_similarity_join(
    left: DataFrame,
    right: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 14,
    n_tables: int = 2,
) -> DataFrame:
    """All pairs (left_id, right_id, similarity ≥ threshold) via LSH
    bucket equi-join + exact verification — never a cross join."""
    def sig(df: DataFrame, prefix: str) -> DataFrame:
        out = df.select(F.col(id_col).alias(f"{prefix}_id"), F.col(vec_col).alias(f"{prefix}_v"))
        for t in range(n_tables):
            out = out.withColumn(
                f"{prefix}_sig{t}",
                random_hyperplane_signature(F.col(f"{prefix}_v"), dim, n_planes, seed=42 + t),
            )
        return out

    l = sig(left, "l")
    r = sig(right, "r")
    pairs = None
    for t in range(n_tables):
        p = l.join(r, F.col(f"l_sig{t}") == F.col(f"r_sig{t}")).select("l_id", "r_id")
        pairs = p if pairs is None else pairs.unionByName(p)
    # dedupe candidate pairs on the narrow (l_id, r_id) projection, then
    # join the vectors back from the inputs for verification — a distinct
    # over two d-float payloads shuffles ~50× more bytes than the ids
    # (same fix as text_dedup.embedding_dedup), and the vector join needs
    # no signature recomputation
    va = left.select(F.col(id_col).alias("l_id"), F.col(vec_col).alias("l_v"))
    vb = right.select(F.col(id_col).alias("r_id"), F.col(vec_col).alias("r_v"))
    return (
        pairs.distinct()
        .join(va, "l_id")
        .join(vb, "r_id")
        .withColumn("similarity", cosine_similarity(F.col("l_v"), F.col("r_v")))
        .filter(F.col("similarity") >= threshold)
        .select("l_id", "r_id", "similarity")
    )
