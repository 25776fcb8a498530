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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    (id_a < id_b).

    Scale shape (round-5 rewrite): the quadratic step runs INSIDE an
    ``applyInPandas`` grouped by cluster id — each vector crosses the
    wire exactly once (total shuffle bytes = corpus size; the previous
    narrow-pair design still materialized (n/k)²·k candidate rows
    through two join-backs).  Within a cell the similarity matrix is a
    blockwise numpy matmul over unit-normalized rows, with the block
    size chosen so the per-block sim matrix stays ~32 MB regardless of
    cell size; only pairs ≥ threshold are emitted.  The per-cell memory
    bound ((n/k)·dim doubles) is the SemDeDup contract: pick
    ``n_clusters`` so cells stay bounded (the paper uses ~100k clusters
    at web scale).

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
    dim = centroids.shape[1]
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        ivf_cell(F.col(vec_col), centroids).alias("cell"),
    )
    id_type = keyed.schema["id"].dataType
    out_schema = T.StructType(
        [
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("sim", T.DoubleType()),
        ]
    )
    thr = float(threshold)

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        # rows with a missing / wrong-dim vector can never verify
        # (cosine with null is null → fails any threshold)
        keep = [
            i
            for i, v in enumerate(pdf["v"])
            if v is not None and len(v) == dim
        ]
        if len(keep) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []})
        sub = pdf.iloc[keep]
        order = np.argsort(sub["id"].to_numpy(), kind="stable")
        ids = sub["id"].to_numpy()[order]
        x = np.stack(sub["v"].to_numpy()[order]).astype(np.float64)
        norms = np.linalg.norm(x, axis=1)
        # zero-norm rows stay all-zero → sim 0.0, matching the SQL
        # cosine's `WHEN denom > 0 ... ELSE 0.0`
        xn = x / np.maximum(norms[:, None], 1e-300)
        n = len(ids)
        # per-block sim matrix capped near 32 MB of float64
        block = max(1, int(4_000_000 // max(n, 1)))
        ia, ib, sims = [], [], []
        for lo in range(0, n - 1, block):
            hi = min(lo + block, n)
            s = xn[lo:hi] @ xn.T
            # keep strictly-upper pairs (global j > global i) — ids are
            # sorted ascending so that is exactly id_a < id_b
            r, c = np.nonzero(s >= thr)
            m = c > (r + lo)
            r, c = r[m], c[m]
            ia.append(ids[r + lo])
            ib.append(ids[c])
            sims.append(s[r, c])
        if not ia:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []})
        return pd.DataFrame(
            {
                "id_a": np.concatenate(ia),
                "id_b": np.concatenate(ib),
                "sim": np.concatenate(sims).astype(np.float64),
            }
        )

    return keyed.groupBy("cell").applyInPandas(cell_pairs, out_schema)


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
