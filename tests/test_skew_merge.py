"""Skew resilience of the merge path (VERDICT r4 item 8).

Two claims, each pinned by a test:

1. CORRECTNESS under skew: a MERGE whose join key is pathologically hot
   (one key owns 50% of the target rows) completes and produces exactly
   the right rows — the shuffle may be lopsided, but nothing about the
   merge algebra (stats-pruned candidates → semi-join → rewrite)
   depends on balance.

2. AQE SPLITS the hot partition: the session factory runs with AQE on;
   for the merge's inner-join shape, Spark's skew-join handling splits
   the oversized partition into multiple tasks once it exceeds the
   skew thresholds. Production thresholds are 256 MB — far above any
   unit-test fixture — so the test lowers them to kilobytes and asserts
   the executed plan actually marks the join ``isSkew=true``; at 100 TB
   the default thresholds trigger the identical mechanism. Measured
   numbers live in SCALE.md ("Merge under key skew").

``functions/joins.py::salted_join`` remains the manual fallback for
engines/paths without AQE; its scatter property is asserted here too.
"""

import os

import pytest
from pyspark.sql import functions as F


def test_merge_correct_under_heavy_key_skew(spark, tmpdir_path):
    """Target: 40k rows, 50% sharing k=0; source: one update row per
    distinct key. Every target row must be updated exactly once."""
    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "skewed_tgt")
    n, hot = 40_000, 0
    target = spark.range(n).select(
        F.when(F.col("id") < n // 2, hot)
        .otherwise((F.col("id") % 2000) + 1)
        .cast("long")
        .alias("k"),
        F.col("id").alias("row_id"),
        F.lit(0).cast("long").alias("version"),
    )
    write_delta(target.repartition(8), p)
    source = (
        spark.range(2001)
        .select(F.col("id").cast("long").alias("k"), F.lit(1).cast("long").alias("v_new"))
    )
    t = DeltaTable.forPath(spark, p)
    (
        t.alias("t")
        .merge(source.alias("s"), "t.k = s.k")
        .whenMatchedUpdate(set={"version": "s.v_new"})
        .execute()
    )
    out = DeltaTable.forPath(spark, p).toDF()
    assert out.count() == n
    assert out.filter("version <> 1").count() == 0  # every row updated once
    assert out.filter("k = 0").count() == n // 2  # hot key intact


def test_aqe_splits_skewed_merge_join_shape(spark):
    """The merge candidate join (big skewed side ⋈ small source) under
    test-scale skew thresholds: the AQE final plan must mark the
    sort-merge join skew-handled, i.e. the hot partition was split
    instead of serializing one giant task."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the SMJ shape
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        n = 200_000
        big = spark.range(n).select(
            F.when(F.col("id") < n // 2, 0)
            .otherwise(F.col("id") % 500)
            .cast("long")
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pad"),
        )
        small = spark.range(500).select(
            F.col("id").cast("long").alias("k"), F.lit(1).alias("m")
        )
        j = big.join(small, "k")
        # collect() (not count()) so THIS DataFrame's own AQE query
        # execution finalizes — count() spawns a separate plan
        assert len(j.collect()) == n
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "AQEShuffleRead coalesced and skewed" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_scatters_hot_key(spark):
    """Manual fallback: salted_join must spread the hot key over all
    salt buckets (no bucket holds more than ~2x its fair share) and
    return the same rows as the plain join."""
    from jodie_spark.functions.joins import salted_join

    n, salt = 50_000, 16
    big = spark.range(n).select(
        F.when(F.col("id") < n // 2, 0).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(100).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
    out = salted_join(big, small, "k", salt=salt)
    assert out.count() == n
    # scatter property: hash-salt the hot key's rows and check balance
    buckets = (
        big.filter("k = 0")
        .withColumn(
            "__salt__",
            F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)).cast("int"),
        )
        .groupBy("__salt__")
        .count()
        .collect()
    )
    assert len(buckets) == salt
    fair = (n // 2) / salt
    assert max(r["count"] for r in buckets) < 2 * fair
