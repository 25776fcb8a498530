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

from pyspark.sql import DataFrame, Window
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


def knn_graph(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 2,
    sample_size: int = 10_000,
    seed: int = 42,
) -> DataFrame:
    """Approximate k-nearest-neighbor graph: ``(id, neighbor_id, sim,
    rank)`` with each vector's top-``k`` cosine neighbors among its
    IVF-bucketed candidates.

    Scale shape (the reason this isn't a self-join): every vector gets
    a single *home* cell plus ``n_probe`` probe cells
    (:func:`jodie_spark.operators.ivf.ivf_probe_cells`); candidates are
    the equi-join of (probe-exploded queries) × (home-keyed corpus) on
    the cell id — the quadratic blowup is confined within cells,
    exactly like SemDeDup/IVF, never a corpus-wide cross join. Pair
    rows narrow to (id, neighbor, sim) BEFORE the multi-probe dedup so
    the shuffle never carries vectors, and per-node top-k is one
    ``row_number`` window over the narrow pairs. Neighbors straddling a
    cell boundary are found when either side probes the other's home
    cell; raise ``n_probe`` for recall, at linear candidate cost.

    Ties break deterministically (sim desc, neighbor id asc); ``sim``
    is rounded to 6 decimals so downstream consumers (and the DuckDB
    oracle) are engine-portable.
    """
    from jodie_spark.operators.ivf import ivf_cell, ivf_probe_cells, train_centroids

    centroids = train_centroids(
        df, vec_col, n_centroids=n_clusters, sample_size=sample_size, seed=seed
    )
    keyed = df.select(
        F.col(id_col).alias("__id__"),
        F.col(vec_col).cast("array<double>").alias("__v__"),
        ivf_cell(F.col(vec_col), centroids).alias("__home__"),
        ivf_probe_cells(F.col(vec_col), centroids, n_probe).alias("__probes__"),
    )
    queries = keyed.select(
        F.col("__id__").alias("__qid__"),
        F.col("__v__").alias("__qv__"),
        F.explode("__probes__").alias("__cell__"),
    )
    corpus = keyed.select(
        F.col("__home__").alias("__cell__"),
        F.col("__id__").alias("__nid__"),
        F.col("__v__").alias("__nv__"),
    )
    pairs = (
        queries.join(corpus, "__cell__")
        .filter(F.col("__qid__") != F.col("__nid__"))
        .select(
            "__qid__",
            "__nid__",
            F.round(cosine_similarity(F.col("__qv__"), F.col("__nv__")), 6).alias(
                "sim"
            ),
        )
        # a pair can meet in several probed cells; sims are identical,
        # so a plain distinct on the narrow rows dedups them
        .dropDuplicates(["__qid__", "__nid__"])
    )
    w = Window.partitionBy("__qid__").orderBy(
        F.col("sim").desc(), F.col("__nid__")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid__").alias(id_col),
            F.col("__nid__").alias("neighbor_id"),
            "sim",
            "rank",
        )
    )
