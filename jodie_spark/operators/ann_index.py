"""Persisted ANN index: IVF cells + PQ codes as a partitioned Delta table.

This composes the two ANN building blocks into the shape they take in a
real 100 TB similarity-search deployment:

* :mod:`jodie_spark.operators.ivf` — coarse quantizer; the cell id
  becomes the table's **partition column**, so a query's probe set turns
  into partition pruning (only ``n_probe/n_centroids`` of the data is
  even listed, let alone scanned);
* :mod:`jodie_spark.operators.pq` — per-row compression; the scan that
  does run scores 8-byte code arrays with pure-codegen ADC lookups and
  touches float vectors only for the final ``k × refine_factor`` rescore.

The trained model (centroids + codebooks) is persisted **in the Delta
log as table properties** — the index is a single self-describing table:
no sidecar files, atomically versioned with the data it indexes, and
readable by any engine that can parse the log.

Build once, query many: ``build_ann_index`` pays one full pass
(train on a bounded driver sample, assign Arrow-vectorized, write
partitioned); every ``query_ann_index`` is a pruned scan + TopK.
"""

from __future__ import annotations

import json
from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jodie_spark.functions.vectors import cosine_similarity
from jodie_spark.operators.ivf import ivf_cell, train_centroids
from jodie_spark.operators.pq import _adc_score, pq_codes, train_pq

_CENTROIDS_PROP = "jodie.ann.ivf.centroids"
_CODEBOOKS_PROP = "jodie.ann.pq.codebooks"


def build_ann_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    index_path: str,
    n_centroids: int = 16,
    m: int = 8,
    n_codes: int = 16,
    sample_size: int = 10_000,
    seed: int = 42,
    mode: str = "error",
) -> None:
    """Train IVF + PQ on a bounded sample, assign every vector its cell
    and codes in one Arrow-vectorized pass, and write the index table
    partitioned by cell with the model in the table properties."""
    # ONE sample collect feeds both trainers (they previously ran two
    # identical limit-collect jobs over the corpus — and limit without
    # order does not even guarantee the two jobs saw the same rows)
    from jodie_spark.operators.ivf import sample_vectors

    sample = sample_vectors(df, vec_col, sample_size)
    centroids = train_centroids(
        df, vec_col, n_centroids=n_centroids, sample_size=sample_size, seed=seed,
        sample=sample,
    )
    books = train_pq(
        df, vec_col, m=m, n_codes=n_codes, sample_size=sample_size, seed=seed,
        sample=sample,
    )
    indexed = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias(vec_col),
        ivf_cell(F.col(vec_col), centroids).alias("cell"),
        pq_codes(F.col(vec_col), books).alias("pq_codes"),
    )
    from jodie_spark.tables.table import write_delta

    write_delta(
        indexed,
        index_path,
        mode=mode,
        partition_by=["cell"],
        options={
            _CENTROIDS_PROP: json.dumps(centroids.tolist()),
            _CODEBOOKS_PROP: json.dumps(books.tolist()),
        },
    )


def load_ann_model(spark: SparkSession, index_path: str) -> tuple[np.ndarray, np.ndarray]:
    """(centroids, codebooks) from the index table's properties."""
    from jodie_spark.tables.table import DeltaTable

    props = DeltaTable.forPath(spark, index_path).snapshot().configuration
    if _CENTROIDS_PROP not in props or _CODEBOOKS_PROP not in props:
        raise ValueError(
            f"{index_path} is not an ANN index table (missing "
            f"{_CENTROIDS_PROP}/{_CODEBOOKS_PROP} properties)"
        )
    return (
        np.asarray(json.loads(props[_CENTROIDS_PROP])),
        np.asarray(json.loads(props[_CODEBOOKS_PROP])),
    )


def query_ann_index(
    spark: SparkSession,
    index_path: str,
    query: Sequence[float],
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_probe: int = 4,
    refine_factor: int = 4,
) -> DataFrame:
    """Top-k cosine neighbors from a persisted index.

    Plan shape: one ``jodie_delta`` scan with ``cell IN (<probes>)``
    pushed down (IN on the partition column → file pruning from the
    log's partitionValues, no data read outside the probed cells);
    ADC-scored in codegen; exact rescore of the ADC top
    ``k × refine_factor``."""
    centroids, books = load_ann_model(spark, index_path)
    q = np.asarray(list(query), dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(centroids @ qn))[:n_probe].tolist()

    mm, _, sub = books.shape
    tables = np.stack([books[j] @ qn[j * sub : (j + 1) * sub] for j in range(mm)])

    from jodie_spark.sources.datasource import register

    register(spark)
    scan = (
        spark.read.format("jodie_delta")
        .load(index_path)
        .filter(F.col("cell").isin([int(c) for c in probe]))
    )

    candidates = (
        scan.select(id_col, vec_col, _adc_score("pq_codes", tables).alias("__adc__"))
        .orderBy(F.col("__adc__").desc(), F.col(id_col))
        .limit(max(k * refine_factor, k))
    )
    q_lit = F.array(*[F.lit(float(x)) for x in query])
    return (
        candidates.select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col), q_lit).alias("similarity"),
        )
        .orderBy(F.col("similarity").desc(), F.col(id_col))
        .limit(k)
    )


def append_to_ann_index(
    df: DataFrame, vec_col: str, id_col: str, index_path: str
) -> None:
    """Grow the index with new vectors — an APPEND that assigns cells
    and PQ codes with the PERSISTED model (never retrains), so probes
    keep partition-pruning correctly and old codes stay comparable.
    Matches the incremental shape of ``minhash_index`` /
    ``hamming_index``: index once, append forever; retrain only when
    the data distribution has drifted enough that recall degrades
    (rebuild with ``build_ann_index(mode='overwrite')``)."""
    centroids, books = load_ann_model(df.sparkSession, index_path)
    indexed = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias(vec_col),
        ivf_cell(F.col(vec_col), centroids).alias("cell"),
        pq_codes(F.col(vec_col), books).alias("pq_codes"),
    )
    from jodie_spark.tables.table import write_delta

    write_delta(indexed, index_path, mode="append", partition_by=["cell"])
