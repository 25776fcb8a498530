"""Distributed spherical k-means (Lloyd's iterations) over an embedding
column — the full-corpus trainer behind SemDeDup-style clustering.

Scale shape per iteration: assignment is the Arrow-vectorized cosine
argmax against the broadcast centroid matrix
(:func:`jodie_spark.operators.ivf.ivf_cell`); the update is ONE
map-side-combined aggregation over ``(cell, dim_pos)`` — the shuffle
carries k·dim partial sums per task, never vectors — and the driver
holds exactly the k×dim centroid matrix. Contrast with
:func:`jodie_spark.operators.ivf.train_centroids`, which trains on a
bounded driver-side sample: use the sample trainer to seed/explore and
this one when the final centroids must reflect the whole corpus.

Convergence/semantics follow the spherical k-means convention used by
SemDeDup (Abbas et al. 2023): members are L2-normalized, a centroid is
the (re-normalized) mean of its members, assignment maximizes cosine.
Deterministic given the init: ties break to the lowest centroid id
(argmax picks the first maximum), and empty cells keep their previous
centroid.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jodie_spark.operators.ivf import ivf_cell


def _normalized(vec_col: str):
    v = F.col(vec_col).cast("array<double>")
    norm = F.greatest(
        F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)), F.lit(1e-12)
    )
    return F.transform(v, lambda x: x / norm)


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    k: int,
    n_iter: int = 5,
    id_col: str | None = None,
    init: np.ndarray | None = None,
) -> np.ndarray:
    """Train k L2-normalized centroids with full-corpus Lloyd's
    iterations. ``init`` seeds explicitly; else the first ``k`` vectors
    ordered by ``id_col`` (deterministic, oracle-friendly); an
    ``id_col=None`` default falls back to the sample trainer's seed."""
    if init is not None:
        cent = np.asarray(init, dtype=np.float64)
    elif id_col is not None:
        rows = (
            df.select(F.col(id_col).alias("__id__"), F.col(vec_col).cast("array<double>"))
            .orderBy("__id__")  # TakeOrderedAndProject: no global sort
            .limit(k)
            .collect()
        )
        cent = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    else:
        from jodie_spark.operators.ivf import train_centroids

        cent = train_centroids(df, vec_col, n_centroids=k, n_iter=0)
    cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    dim = cent.shape[1]

    for _ in range(n_iter):
        assigned = df.select(
            ivf_cell(F.col(vec_col), cent).alias("__cell__"),
            _normalized(vec_col).alias("__nv__"),
        )
        # ONE aggregation: partial (cell, pos) sums combine map-side, so
        # the shuffle is k*dim rows per task regardless of corpus size
        rows = (
            assigned.select(
                "__cell__", F.posexplode("__nv__").alias("__pos__", "__val__")
            )
            .groupBy("__cell__", "__pos__")
            .agg(F.sum("__val__").alias("__sum__"), F.count(F.lit(1)).alias("__n__"))
            .collect()
        )
        sums = np.zeros((len(cent), dim))
        counts = np.zeros(len(cent))
        for r in rows:
            sums[r["__cell__"], r["__pos__"]] = r["__sum__"]
            counts[r["__cell__"]] = r["__n__"]
        for c in range(len(cent)):
            if counts[c] > 0:
                m = sums[c] / counts[c]
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def kmeans_assign(
    df: DataFrame, vec_col: str, centroids: np.ndarray, cluster_col: str = "cluster"
) -> DataFrame:
    """Attach the nearest-centroid id (cosine argmax, ties → lowest
    id). At scale, write the result partitioned/bucketed by this column
    so per-cluster work becomes partition-pruned."""
    return df.withColumn(cluster_col, ivf_cell(F.col(vec_col), centroids))
