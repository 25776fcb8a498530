"""Product-quantization (PQ) approximate nearest-neighbor search.

The memory-side of the classic IVF-PQ index (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011): split each
D-dim vector into ``m`` subvectors, k-means each subspace into
``n_codes`` centroids, and store a vector as ``m`` small codes
(m bytes at n_codes ≤ 256 vs 4·D bytes of floats — a 32× compression
at D=64, m=8). A query is answered with an asymmetric distance
computation (ADC): precompute the query's similarity to every centroid
of every subspace (an ``m × n_codes`` table), then score a database
vector as the sum of ``m`` table lookups — no float vector is touched.

Scale design (100 TB): training is a bounded driver-side sample (like
:mod:`jodie_spark.operators.ivf` — codebook quality needs thousands of
vectors, not billions); code assignment is a one-time Arrow-vectorized
pass whose output (an ``array<int>`` of length m) is what you persist;
the *query-time scan is pure Catalyst* — the ADC lookup tables are
literal arrays folded into the plan, the score is ``m`` ``element_at``
calls inside whole-stage codegen, and the result is a
TakeOrderedAndProject. No UDF, no shuffle of raw vectors; at query time
only (id, codes) flow. Compose with IVF cell assignments to prune the
scan itself.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jodie_spark.functions.vectors import cosine_similarity


def train_pq(
    df: DataFrame,
    vec_col: str,
    m: int = 8,
    n_codes: int = 16,
    sample_size: int = 10_000,
    n_iter: int = 10,
    seed: int = 42,
    sample: np.ndarray | None = None,
) -> np.ndarray:
    """K-means codebooks per subspace on a deterministic sample (pass
    ``sample`` to reuse an already-collected one).
    Returns ``(m, n_codes, D/m)``; vectors are L2-normalized first so
    summed subspace inner products approximate the full cosine."""
    if sample is None:
        from jodie_spark.operators.ivf import sample_vectors

        x = sample_vectors(df, vec_col, sample_size)
    else:
        x = np.asarray(sample, dtype=np.float64)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"vector dim {d} not divisible by m={m} subvectors")
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    sub = d // m
    rng = np.random.default_rng(seed)
    books = np.zeros((m, n_codes, sub))
    for j in range(m):
        xj = x[:, j * sub : (j + 1) * sub]
        k = min(n_codes, len(xj))
        cent = xj[rng.choice(len(xj), size=k, replace=False)]
        for _ in range(n_iter):
            d2 = ((xj[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                members = xj[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j, :k] = cent
        if k < n_codes:  # degenerate tiny sample: repeat last centroid
            books[j, k:] = cent[-1]
    return books


def pq_codes(vec: Column, codebooks: np.ndarray) -> Column:
    """``array<int>`` of ``m`` nearest-centroid codes per vector
    (Arrow-vectorized against the broadcast codebooks)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    books = codebooks  # (m, k, sub)
    m, _, sub = books.shape

    @pandas_udf(ArrayType(IntegerType()))
    def encode(batch: pd.Series) -> pd.Series:
        out: list[list[int] | None] = [None] * len(batch)
        ok = [
            i
            for i, v in enumerate(batch)
            if v is not None and len(v) == m * sub
        ]
        if ok:
            x = np.stack([np.asarray(batch.iloc[i], dtype=np.float64) for i in ok])
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            codes = np.zeros((len(ok), m), dtype=np.int32)
            for j in range(m):
                xj = x[:, j * sub : (j + 1) * sub]
                # ||x - c||² argmin == (c·c - 2 x·c) argmin, vectorized
                cc = (books[j] ** 2).sum(axis=1)
                codes[:, j] = (cc[None, :] - 2.0 * (xj @ books[j].T)).argmin(axis=1)
            for row, i in enumerate(ok):
                out[i] = codes[row].tolist()
        return pd.Series(out)

    return encode(vec)


def with_pq_codes(
    df: DataFrame, vec_col: str, codebooks: np.ndarray, code_col: str = "__pq__"
) -> DataFrame:
    """Attach PQ codes. Persist the result once; queries then scan only
    (id, codes) — the raw vector column prunes away."""
    return df.withColumn(code_col, pq_codes(F.col(vec_col), codebooks))


def _adc_score(code_col: str, tables: np.ndarray) -> Column:
    """Sum of per-subspace table lookups — literal arrays + element_at,
    fully inside whole-stage codegen."""
    terms = [
        F.element_at(
            F.array(*[F.lit(float(v)) for v in tables[j]]),
            F.col(code_col).getItem(j) + 1,
        )
        for j in range(tables.shape[0])
    ]
    score = terms[0]
    for t in terms[1:]:
        score = score + t
    return score


def pq_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    codebooks: np.ndarray | None = None,
    code_col: str = "__pq__",
    refine_factor: int = 4,
) -> DataFrame:
    """Approximate cosine top-k via ADC over PQ codes, with an exact
    rescore of the top ``k * refine_factor`` ADC candidates (the
    standard recall-restoring refinement step). Pass precomputed
    ``codebooks`` + a DataFrame already carrying ``code_col`` to skip
    training and assignment."""
    if codebooks is None:
        codebooks = train_pq(df, vec_col, m=m, n_codes=n_codes)
    if code_col not in df.columns:
        df = with_pq_codes(df, vec_col, codebooks, code_col)

    q = np.asarray(list(query), dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    mm, _, sub = codebooks.shape
    # ADC tables: query-subvector · centroid, per subspace
    tables = np.stack(
        [codebooks[j] @ q[j * sub : (j + 1) * sub] for j in range(mm)]
    )  # (m, n_codes)

    candidates = (
        df.select(id_col, vec_col, _adc_score(code_col, tables).alias("__adc__"))
        .orderBy(F.col("__adc__").desc(), F.col(id_col))
        .limit(max(k * refine_factor, k))
    )
    q_lit = F.array(*[F.lit(float(x)) for x in query])
    return (
        candidates.select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col).cast("array<double>"), q_lit).alias(
                "similarity"
            ),
        )
        .orderBy(F.col("similarity").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVFADC — IVF cell pruning + PQ over residuals (Jégou et al. 2011 §IV)
# ---------------------------------------------------------------------------


def train_ivfpq(
    df: DataFrame,
    vec_col: str,
    n_centroids: int = 16,
    m: int = 8,
    n_codes: int = 16,
    sample_size: int = 10_000,
    n_iter: int = 10,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """Train the IVFADC pair on one deterministic driver-side sample:
    spherical k-means coarse centroids, then per-subspace k-means
    codebooks over the RESIDUALS ``x − c(x)`` (residual energy is what
    PQ must encode once the coarse quantizer explains the rest —
    the layout FAISS's IndexIVFPQ uses). Returns
    ``(centroids (n_centroids × D), codebooks (m × n_codes × D/m))``."""
    sample = [
        np.asarray(r[0], dtype=np.float64)
        for r in df.select(vec_col).limit(sample_size).collect()
    ]
    x = np.stack(sample)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"vector dim {d} not divisible by m={m} subvectors")
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(n_iter):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                mvec = members.mean(axis=0)
                cent[c] = mvec / max(np.linalg.norm(mvec), 1e-12)
    res = x - cent[(x @ cent.T).argmax(axis=1)]
    sub = d // m
    books = np.zeros((m, n_codes, sub))
    for j in range(m):
        xj = res[:, j * sub : (j + 1) * sub]
        k = min(n_codes, len(xj))
        cb = xj[rng.choice(len(xj), size=k, replace=False)]
        for _ in range(n_iter):
            d2 = ((xj[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(k):
                members = xj[a == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        books[j, :k] = cb
        if k < n_codes:
            books[j, k:] = cb[-1]
    return cent, books


def with_ivfpq_codes(
    df: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    cell_col: str = "__ivf_cell__",
    code_col: str = "__pq__",
) -> DataFrame:
    """One Arrow-vectorized pass attaching (coarse cell, residual PQ
    codes) per vector — the persisted index columns. At rest a vector
    is an int + m small ints; queries scan only probed cells and never
    touch the float column until the exact-rescore step."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StructField,
        StructType,
    )

    cent = centroids
    books = codebooks
    mm, _, sub = books.shape

    out_t = StructType(
        [
            StructField("cell", IntegerType()),
            StructField("codes", ArrayType(IntegerType())),
        ]
    )

    @pandas_udf(out_t)
    def encode(batch: pd.Series) -> pd.DataFrame:
        cells: list[int | None] = [None] * len(batch)
        codes: list[list[int] | None] = [None] * len(batch)
        ok = [
            i
            for i, v in enumerate(batch)
            if v is not None and len(v) == mm * sub
        ]
        if ok:
            x = np.stack([np.asarray(batch.iloc[i], dtype=np.float64) for i in ok])
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            cell = (x @ cent.T).argmax(axis=1).astype(np.int32)
            res = x - cent[cell]
            cd = np.zeros((len(ok), mm), dtype=np.int32)
            for j in range(mm):
                rj = res[:, j * sub : (j + 1) * sub]
                cc = (books[j] ** 2).sum(axis=1)
                cd[:, j] = (cc[None, :] - 2.0 * (rj @ books[j].T)).argmin(axis=1)
            for row, i in enumerate(ok):
                cells[i] = int(cell[row])
                codes[i] = cd[row].tolist()
        return pd.DataFrame({"cell": cells, "codes": codes})

    s = encode(F.col(vec_col))
    return df.withColumn(cell_col, s.getField("cell")).withColumn(
        code_col, s.getField("codes")
    )


def ivfpq_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
    cell_col: str = "__ivf_cell__",
    code_col: str = "__pq__",
    refine_factor: int = 4,
) -> DataFrame:
    """IVFADC cosine top-k — the canonical billion-scale ANN shape:

    1. probe the ``n_probe`` coarse cells nearest to the query
       (partition pruning when ``cell_col`` is the partition column);
    2. score survivors with per-cell ADC over RESIDUAL PQ codes:
       ``x·q ≈ c_cell·q + Σ_j T_cell[j][code_j]`` where
       ``T_cell[j] = codebook_j · (q − c_cell)_j`` — the tables fold
       into the plan as literal arrays behind a CASE on the cell id,
       so scoring is whole-stage-codegen lookups, no UDF, and no
       float vector is read;
    3. exactly rescore the top ``k·refine_factor`` ADC candidates
       (recall-restoring refinement).

    Pass precomputed ``centroids``+``codebooks`` and a DataFrame
    already carrying ``cell_col``/``code_col`` to skip training and
    assignment (the persisted-index pattern)."""
    if centroids is None or codebooks is None:
        centroids, codebooks = train_ivfpq(
            df, vec_col, n_centroids=n_centroids, m=m, n_codes=n_codes
        )
    if cell_col not in df.columns or code_col not in df.columns:
        df = with_ivfpq_codes(df, vec_col, centroids, codebooks, cell_col, code_col)

    q = np.asarray(list(query), dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(centroids @ qn))[: int(n_probe)].tolist()
    mm, _, sub = codebooks.shape

    score = None
    for c in probe:
        resq = qn - centroids[c]
        tables = np.stack(
            [codebooks[j] @ resq[j * sub : (j + 1) * sub] for j in range(mm)]
        )
        base = float(centroids[c] @ qn)
        expr = F.lit(base) + _adc_score(code_col, tables)
        score = (
            F.when(F.col(cell_col) == c, expr)
            if score is None
            else score.when(F.col(cell_col) == c, expr)
        )

    candidates = (
        df.filter(F.col(cell_col).isin(probe))
        .select(id_col, vec_col, score.alias("__adc__"))
        .orderBy(F.col("__adc__").desc(), F.col(id_col))
        .limit(max(k * refine_factor, k))
    )
    q_lit = F.array(*[F.lit(float(x)) for x in query])
    return (
        candidates.select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col).cast("array<double>"), q_lit).alias(
                "similarity"
            ),
        )
        .orderBy(F.col("similarity").desc(), F.col(id_col))
        .limit(k)
    )
