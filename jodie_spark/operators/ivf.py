"""IVF (inverted-file) approximate nearest-neighbor search.

The coarse-quantizer alternative to LSH bucketing: k-means centroids
partition the corpus into cells; a query probes only the ``n_probe``
nearest cells. At 100 TB the assignments are computed once
(:func:`with_ivf_assignments`), persisted as a plain integer column —
ideally a *partition* column, making a probe a partition-pruned scan —
and every query reads ~``n_probe/n_centroids`` of the data.

Training runs on a driver-side sample (classic IVF practice — centroid
quality needs thousands of vectors, not billions); assignment is an
Arrow-vectorized argmin over the broadcast centroid matrix.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jodie_spark.functions.vectors import cosine_similarity


def sample_vectors(df: DataFrame, vec_col: str, sample_size: int) -> np.ndarray:
    """One driver-side training sample — collect it once and hand it to
    every trainer that needs it (train_centroids + train_pq in
    build_ann_index previously each ran their own identical
    limit-collect job over the corpus)."""
    return np.stack(
        [
            np.asarray(r[0], dtype=np.float64)
            for r in df.select(vec_col).limit(sample_size).collect()
        ]
    )


def train_centroids(
    df: DataFrame,
    vec_col: str,
    n_centroids: int = 16,
    sample_size: int = 10_000,
    n_iter: int = 10,
    seed: int = 42,
    sample: np.ndarray | None = None,
) -> np.ndarray:
    """Spherical k-means on a deterministic sample (pass ``sample`` to
    reuse an already-collected one). Returns ``(n_centroids × dim)``
    L2-normalized centroids."""
    x = sample if sample is not None else sample_vectors(df, vec_col, sample_size)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(n_iter):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def ivf_cell(vec: Column, centroids: np.ndarray) -> Column:
    """Nearest-centroid id for each vector (Arrow-vectorized argmax of
    the cosine against the broadcast centroid matrix)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    cent_t = centroids.T  # (dim × k)

    @pandas_udf(IntegerType())
    def cell(batch: pd.Series) -> pd.Series:
        out = np.zeros(len(batch), dtype=np.int32)
        ok = [i for i, v in enumerate(batch) if v is not None and len(v) == cent_t.shape[0]]
        if ok:
            m = np.stack([np.asarray(batch.iloc[i], dtype=np.float64) for i in ok])
            norms = np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            out[ok] = ((m / norms) @ cent_t).argmax(axis=1).astype(np.int32)
        return pd.Series(out)

    return cell(vec)


def with_ivf_assignments(
    df: DataFrame, vec_col: str, centroids: np.ndarray, cell_col: str = "__ivf_cell__"
) -> DataFrame:
    """Attach the IVF cell id. Persist (or partition by) the result once
    and reuse it across queries — at scale, write the table partitioned
    by this column so probes become partition-pruned scans."""
    return df.withColumn(cell_col, ivf_cell(F.col(vec_col), centroids))


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: np.ndarray | None = None,
    cell_col: str = "__ivf_cell__",
) -> DataFrame:
    """Approximate cosine top-k probing the ``n_probe`` cells nearest to
    the query. Pass precomputed ``centroids`` + a DataFrame that already
    carries ``cell_col`` (from :func:`with_ivf_assignments`) to skip
    training and assignment — then only candidate rows are scored."""
    if centroids is None:
        centroids = train_centroids(df, vec_col, n_centroids)
    if cell_col not in df.columns:
        df = with_ivf_assignments(df, vec_col, centroids, cell_col)

    q = np.asarray(list(query), dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(centroids @ qn))[:n_probe].tolist()

    q_lit = F.array(*[F.lit(float(x)) for x in query])
    return (
        df.filter(F.col(cell_col).isin(probe))
        .select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col).cast("array<double>"), q_lit).alias("similarity"),
        )
        .orderBy(F.col("similarity").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_probe_cells(vec: Column, centroids: np.ndarray, n_probe: int) -> Column:
    """Array of the ``n_probe`` nearest cell ids for each vector (home
    cell first) — the multi-probe assignment a KNN-graph build uses so
    near neighbors that straddle a cell boundary still meet in at least
    one probed cell. Arrow-vectorized numpy, same kernel shape as
    :func:`ivf_cell`."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    cent_t = centroids.T
    p = int(min(n_probe, centroids.shape[0]))

    @pandas_udf(ArrayType(IntegerType()))
    def cells(batch: pd.Series) -> pd.Series:
        out = [None] * len(batch)
        ok = [i for i, v in enumerate(batch) if v is not None and len(v) == cent_t.shape[0]]
        if ok:
            m = np.stack([np.asarray(batch.iloc[i], dtype=np.float64) for i in ok])
            norms = np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            sims = (m / norms) @ cent_t
            top = np.argsort(-sims, axis=1)[:, :p].astype(np.int32)
            for row, i in enumerate(ok):
                out[i] = top[row].tolist()
        return pd.Series(out)

    return cells(vec)
