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
