"""Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
embedding space with k-means, then drop near-identical documents within
each cluster — the published recipe for pruning semantically redundant
web data before LLM training.

Scale shape: the quadratic step is confined WITHIN clusters — the
cluster id is an equi-join key, so candidate generation is a bucket
join exactly like the LSH dedups (never a corpus-wide cross join), and
the per-cluster pair count is bounded by (n/k)². Choose ``n_clusters ∝
corpus/√(acceptable pair budget)``; the paper uses ~100k clusters at
web scale. Centroid training is a bounded driver-side sample
(:func:`jodie_spark.operators.ivf.train_centroids`), assignment is one
Arrow-vectorized pass, and the survivors election reuses the
connected-components machinery (transitive groups collapse to one
survivor — the lowest id, deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jodie_spark.functions.vectors import cosine_similarity
from jodie_spark.operators.ivf import ivf_cell, train_centroids


def semantic_candidate_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_clusters: int = 16,
    threshold: float = 0.9,
    sample_size: int = 10_000,
    seed: int = 42,
    trainer: str = "sample",
) -> DataFrame:
    """(id_a, id_b, sim) for same-cluster pairs with cosine ≥ threshold
    (id_a < id_b). The join fans out only within clusters.

    ``trainer='full'`` swaps the bounded-sample centroid trainer for
    the distributed full-corpus Lloyd's iterations
    (:func:`jodie_spark.operators.kmeans.kmeans_fit`) — same output
    shape, centroids that reflect every vector."""
    if trainer == "full":
        from jodie_spark.operators.kmeans import kmeans_fit

        centroids = kmeans_fit(df, vec_col, k=n_clusters, n_iter=5, id_col=id_col)
    else:
        centroids = train_centroids(
            df, vec_col, n_centroids=n_clusters, sample_size=sample_size, seed=seed
        )
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        ivf_cell(F.col(vec_col), centroids).alias("cell"),
    )
    # narrow-pair fan-out (same shape as embedding_dedup): the (n/k)²
    # within-cluster join shuffles (cell, id) pairs only; the full
    # vectors are joined back by id for the cosine verify, so each
    # vector crosses the wire once per side, not once per candidate
    a = keyed.select("cell", F.col("id").alias("id_a"))
    b = keyed.select("cell", F.col("id").alias("id_b"))
    pairs = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    # vector lookup sides skip the ivf_cell kernel entirely (plain
    # projections — column pruning reaches the scan)
    vecs = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    va = vecs.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    vb = vecs.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("sim", cosine_similarity(F.col("v_a"), F.col("v_b")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def semantic_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_clusters: int = 16,
    threshold: float = 0.9,
    sample_size: int = 10_000,
    seed: int = 42,
    trainer: str = "sample",
) -> DataFrame:
    """Keep one survivor (lowest id, transitively) per group of
    semantically near-identical documents; rows with no near-duplicate
    pass through untouched."""
    from jodie_spark.operators.text_dedup import connected_component_reps

    pairs = semantic_candidate_pairs(
        df, vec_col, id_col, n_clusters, threshold, sample_size, seed, trainer
    ).select("id_a", "id_b")
    reps = connected_component_reps(pairs.select("id_a", "id_b"))
    dropped = reps.filter(F.col("id") != F.col("rep")).select(
        F.col("id").alias(id_col)
    )
    return df.join(dropped, id_col, "left_anti")
