"""Vector (embedding-column) primitives over ``array<float>`` columns.

All JVM-side: ``zip_with`` + ``aggregate`` keep the dot products inside
codegen; no Python crosses the row boundary. At 100 TB the alternative
(a per-row Python UDF) is 10-100× slower — these are the hot inner
loops of similarity search and embedding dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def l2_normalize(vec: Column) -> Column:
    """Unit-norm copy of the vector as ``array<double>`` (all-zero
    vectors stay all-zero). Pure ``transform``/``aggregate`` — codegen,
    no Python."""
    d = F.transform(vec, lambda x: x.cast("double"))
    n = l2_norm(d)
    # same lambda-binding trick as int8_quantize: keep the norm out of
    # the per-element lambda or Catalyst re-evaluates it per element
    return F.transform(
        F.array(F.struct(d.alias("d"), n.alias("n"))),
        lambda s: F.when(
            s["n"] > 0, F.transform(s["d"], lambda x: x / s["n"])
        ).otherwise(s["d"]),
    )[0]


def int8_quantize(vec: Column) -> Column:
    """Symmetric int8 quantization: struct of the quantized codes
    (``q``: array of -127..127 as long) and the float scale
    (``max_abs``), the standard storage/bandwidth reduction for ANN
    indexes over large embedding corpora. Exact-integer output makes it
    verifiable bit-for-bit against any other engine."""
    d = F.transform(vec, lambda x: x.cast("double"))
    mx = F.array_max(F.transform(d, F.abs))
    # Bind (d, mx) through a lambda variable before the per-element
    # division: a free column expression referenced inside a lambda is
    # INLINED by Catalyst and re-evaluated per element — array_max over
    # the whole vector, once per code, a 64× blowup at dim=64. A lambda
    # variable cannot be inlined, so mx is computed exactly once per row.
    return F.transform(
        F.array(F.struct(d.alias("d"), mx.alias("m"))),
        lambda s: F.struct(
            F.when(
                s["m"] > 0,
                F.transform(s["d"], lambda x: F.round(x / s["m"] * 127).cast("long")),
            )
            .otherwise(F.transform(s["d"], lambda x: F.lit(0).cast("long")))
            .alias("q"),
            s["m"].alias("max_abs"),
        ),
    )[0]


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian hyperplanes for sign-random-projection LSH
    (Charikar's SimHash for cosine similarity)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def random_hyperplane_signature(
    vec: Column, dim: int, n_planes: int = 16, seed: int = 42
) -> Column:
    """Bit-signature of a vector under ``n_planes`` random hyperplanes,
    packed into a long. Vectors with high cosine similarity agree on
    most bits, so equal signatures ⇒ strong ANN bucket key.

    Arrow-vectorized: the whole batch's signatures are one
    ``(n × dim) @ (dim × n_planes)`` matrix product in numpy — the
    expression-tree alternative (n_planes interpreted ``aggregate``
    passes per row) measures several times slower.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    planes_t = random_hyperplanes(dim, n_planes, seed).T  # (dim × planes)
    weights = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64)).astype(np.uint64)

    @pandas_udf(LongType())
    def sig(batch: pd.Series) -> pd.Series:
        out = np.zeros(len(batch), dtype=np.uint64)
        ok = [i for i, v in enumerate(batch) if v is not None and len(v) == planes_t.shape[0]]
        if ok:
            m = np.stack([np.asarray(batch.iloc[i], dtype=np.float64) for i in ok])
            bits = (m @ planes_t) >= 0  # (n × planes)
            out[ok] = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1)
        return pd.Series(out.view(np.int64))

    return sig(vec)
