"""Skew-mitigation join/aggregation helpers.

AQE's skew-join splitting handles most runtime skew; explicit salting
remains the tool when one join key dominates so heavily that even split
partitions overwhelm an executor (the classic heavy-hitter user_id at
100 TB). The pattern: replicate the small side ``salt`` times, scatter
the big side uniformly across the replicas, join on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with the big side's
    hot keys scattered over ``salt`` sub-partitions.

    The small side is replicated ``salt``× (do NOT use for a large right
    side); the big side gets a deterministic-per-row uniform salt from a
    hash of all its columns, so the same shuffle key never concentrates.
    Result columns = big's + small's (minus the duplicate join column).
    """
    salt_values = F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    small_rep = small.withColumn("__salt__", salt_values)
    big_salted = big.withColumn(
        "__salt__", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)).cast("int")
    )
    joined = big_salted.join(small_rep, [on, "__salt__"], how)
    return joined.drop("__salt__")


def salted_count(df: DataFrame, key: str, salt: int = 16) -> DataFrame:
    """Two-stage count per key: pre-aggregate on (key, salt), then merge
    — bounds any single reducer's input even for a single dominant key.
    (Spark's partial aggregation usually achieves this already; this is
    the explicit form for when map-side combine is defeated, e.g. after
    an explode.)"""
    pre = (
        df.withColumn("__salt__", F.pmod(F.spark_partition_id(), F.lit(salt)))
        .groupBy(key, "__salt__")
        .agg(F.count(F.lit(1)).alias("__c__"))
    )
    return pre.groupBy(key).agg(F.sum("__c__").cast("long").alias("count"))
