"""KMV (k-minimum-values) distinct-count and set-overlap sketches.

The bottom-k sketch (Bar-Yossef et al. 2002; the same family as
DataSketches' theta sketch): hash every value to a uniform 64-bit
point, keep the k smallest per group. The k-th smallest hash estimates
distinct count as ``(k-1) / U(h_k)`` where ``U`` maps the hash onto
(0, 1); unioning two sketches = merging and re-taking bottom-k, which
gives cardinalities of unions — and with inclusion-exclusion,
intersections and Jaccard — WITHOUT rescanning either corpus. The
100 TB use case: estimate overlap between two crawls (pre-dedup
planning, contamination triage) from two k-row summaries instead of a
corpus-sized join.

Everything is deterministic built-in expressions (md5-prefix hashing,
exact integer order statistics), so a SQL oracle replicates estimates
VALUE-FOR-VALUE — the correctness check is exact even though the
estimate itself is approximate.

Scale shape: the only corpus-sized operation is one partial-aggregated
shuffle per sketch — map-side each task keeps its own bottom-k (the
two-stage (group, salt) election, same pattern as cap_per_domain), so
the exchange carries at most ``salt_partitions × k`` rows per group,
never the corpus. Sketches are k-row arrays; all set algebra happens
driver-side or broadcast."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# md5-prefix → uniform 63-bit point (same engine-portable hash family
# as classifier.hashed_token_bucket; 15 hex chars = 60 bits keeps the
# value exactly representable everywhere)
_HASH_BITS = 60
_HASH_MAX = float(1 << _HASH_BITS)


def kmv_hash(col: Column) -> Column:
    """Uniform point in [0, 2^60): first 15 hex chars of md5."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
    salt_partitions: int = 32,
) -> DataFrame:
    """Bottom-k sketch of ``value_col`` per group: columns
    ``(*group_cols, kmv)`` where ``kmv`` is the sorted array of the k
    smallest distinct hash points. Exact for groups with < k distinct
    values (the array is just all of them)."""
    group_cols = list(group_cols or [])
    hashed = df.select(
        *group_cols, kmv_hash(F.col(value_col)).alias("__h__")
    ).dropDuplicates([*group_cols, "__h__"])
    # two-stage bottom-k: per-(group, salt) slice bounds the collected
    # array to its salt's distinct values, then the merge re-slices —
    # every global bottom-k element is in its salt's bottom-k
    salted = hashed.withColumn(
        "__salt__", F.pmod(F.col("__h__"), F.lit(salt_partitions))
    )
    stage1 = salted.groupBy(*group_cols, "__salt__").agg(
        F.slice(F.array_sort(F.collect_set("__h__")), 1, k).alias("__part__")
    )
    return stage1.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("__part__"))), 1, k
        ).alias("kmv")
    )


def kmv_estimate(kmv: Column, k: int = 256) -> Column:
    """Distinct-count estimate from a sketch array: exact size when the
    group had fewer than k distinct values, else ``(k-1) / U(h_k)``."""
    n = F.size(kmv)
    kth = F.element_at(kmv, k).cast("double")
    return F.when(
        n < k, n.cast("double")
    ).otherwise((k - 1) / ((kth + 1.0) / F.lit(_HASH_MAX)))


def kmv_union(a: Column, b: Column, k: int = 256) -> Column:
    """Sketch of the UNION of the two sketched sets."""
    return F.slice(F.array_sort(F.array_union(a, b)), 1, k)


def kmv_overlap(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int = 256
) -> DataFrame:
    """Set-overlap estimates from two single-group sketches: one row
    ``(n_a, n_b, n_union, n_intersect, jaccard)``. Jaccard uses the
    STANDARD KMV intersection estimator — the fraction ρ of the union
    sketch's bottom-k members present in BOTH input sketches is an
    unbiased sample of the union, so ``|A∩B| ≈ ρ · |A∪B|`` — which is
    far tighter than inclusion-exclusion differencing (~1/sqrt(k)
    relative on ρ itself, no large-number cancellation)."""
    a = sketch_a.select(F.col("kmv").alias("__a__"))
    b = sketch_b.select(F.col("kmv").alias("__b__"))
    both = a.crossJoin(b)  # 1x1: two k-row arrays, never data
    u = kmv_union(F.col("__a__"), F.col("__b__"), k)
    est_a = kmv_estimate(F.col("__a__"), k)
    est_b = kmv_estimate(F.col("__b__"), k)
    est_u = kmv_estimate(u, k)
    shared = F.size(
        F.array_intersect(F.array_intersect(u, F.col("__a__")), F.col("__b__"))
    )
    rho = shared.cast("double") / F.size(u).cast("double")
    inter = rho * est_u
    return both.select(
        F.round(est_a, 4).alias("n_a"),
        F.round(est_b, 4).alias("n_b"),
        F.round(est_u, 4).alias("n_union"),
        F.round(inter, 4).alias("n_intersect"),
        F.round(rho, 6).alias("jaccard"),
    )
