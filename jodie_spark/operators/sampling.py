"""Deterministic sampling and corpus mixing.

Training-data pipelines need REPRODUCIBLE sampling — the same document
set must survive a re-run on different cluster sizes and partition
layouts, which rules out ``DataFrame.sample`` (partition-seeded RNG,
layout-dependent). Everything here decides membership from the row's
own id, so the sample is a pure function of the data:

- ``method='affine'`` (default): a Knuth-style multiplicative scatter
  in exact BIGINT arithmetic — identical in any ANSI SQL engine, so
  results are portable across Spark, DuckDB, Trino, ….
- ``method='xxhash'``: Spark's ``xxhash64`` — stronger scatter if ids
  are adversarial/structured; Spark-specific output.

Both are plain comparisons inside one ``filter`` — full codegen,
pushdown-friendly, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Affine-scatter constants: id is folded into [0, _P) (prime), scattered
# by the Knuth multiplicative constant, then bucketed mod _M. All
# intermediates fit comfortably in signed 64-bit: (_P-1)*_K < 2^52.
_P = 1_000_003
_K = 2_654_435_761
_M = 1_048_576


def sample_bucket(id_col: Column, salt: int = 0, method: str = "affine") -> Column:
    """Deterministic bucket in [0, 1_048_576) for a numeric/string id."""
    if method == "xxhash":
        return F.pmod(F.xxhash64(id_col, F.lit(salt)), F.lit(_M))
    if method != "affine":
        raise ValueError(f"unknown sampling method: {method!r}")
    # salt folds in BEFORE the multiplicative scatter so a new salt
    # redraws the whole sample (afterwards it would only shift buckets
    # by `salt`, barely changing membership)
    r = F.pmod(id_col.cast("long") + F.lit(salt), F.lit(_P))
    return F.pmod(r * F.lit(_K), F.lit(_M))


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: int = 0,
    method: str = "affine",
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen deterministically by id."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(round(fraction * _M))
    return df.filter(sample_bucket(F.col(id_col), salt, method) < threshold)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: int = 0,
    method: str = "affine",
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing primitive
    ("keep 100% of wikipedia, 10% of commoncrawl"). One filter, no
    shuffle; the per-row threshold is a broadcast map lookup."""
    for stratum, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {stratum!r} must be in [0, 1], got {frac}")
    mapping = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in (kv[0], float(kv[1]))]
    )
    frac = F.coalesce(mapping[F.col(strata_col)], F.lit(float(default_fraction)))
    threshold = F.round(frac * _M).cast("long")
    return df.filter(sample_bucket(F.col(id_col), salt, method) < threshold)


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    epoch: int = 0,
    method: str = "affine",
    key_col: str = "__shuffle_key__",
) -> DataFrame:
    """Deterministic global shuffle for one training epoch.

    Training runs need every epoch to visit documents in a different —
    but REPRODUCIBLE and layout-independent — order. ``orderBy(rand())``
    is neither. This attaches the affine scatter of ``(id, epoch)`` as a
    sort key and range-partitions + sorts by it, so the output files
    read back in shuffled order, partitions are globally ordered (a
    trainer can stream partition 0, 1, 2, …), and epoch N is the same
    permutation on any cluster.

    The only wide exchange is the range partitioning itself — the same
    cost any epoch shuffle must pay at least once; there is no
    single-partition global sort.
    """
    key = sample_bucket(F.col(id_col), salt=epoch, method=method)
    return (
        df.withColumn(key_col, key)
        .repartitionByRange(F.col(key_col), F.col(id_col))
        .sortWithinPartitions(key_col, id_col)
    )


def mixture_weights(
    df: DataFrame,
    source_col: str,
    alpha: float = 0.5,
    weight_col: str | None = None,
) -> DataFrame:
    """Temperature-scaled corpus mixture weights (the data-recipe step
    of LLaMA/PaLM-style training mixes): with ``p_i`` the natural share
    of source ``i`` (by document count, or by ``weight_col`` sums — e.g.
    token counts), the sampling weight is ``q_i ∝ p_i^alpha``.
    ``alpha=1`` keeps natural proportions; ``alpha→0`` approaches
    uniform over sources; ``alpha≈0.5`` is the common up-weighting of
    small high-quality sources.

    Returns ``source_col, n, p, weight, multiplier`` where ``multiplier
    = weight/p`` is the over/under-sampling factor to apply (feed it to
    :func:`stratified_sample` fractions or a repetition policy).

    The per-source aggregation is the only shuffle; the two unpartitioned
    windows run over the already-aggregated #sources rows (tiny by
    construction — a corpus has dozens of sources, not millions).
    """
    from pyspark.sql import Window

    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    agg = F.count(F.lit(1)) if weight_col is None else F.sum(F.col(weight_col))
    counts = df.groupBy(source_col).agg(agg.cast("long").alias("n"))
    everything = Window.partitionBy()
    return (
        counts.withColumn("p", F.col("n") / F.sum("n").over(everything))
        .withColumn("__a__", F.pow(F.col("p"), F.lit(float(alpha))))
        .withColumn("weight", F.col("__a__") / F.sum("__a__").over(everything))
        .withColumn("multiplier", F.col("weight") / F.col("p"))
        .drop("__a__")
    )
