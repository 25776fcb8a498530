"""Broadcast Bloom-filter incremental dedup (operators/bloom.py):
no-false-negatives guarantee, engine-portable position arithmetic,
distributed build = single-partition build, and the no-shuffle probe
plan. Extends the reference's exact dedup family
(DeltaHelpers.scala:243-330) with the constant-memory probe."""

import duckdb
import pytest
from pyspark.sql import functions as F

from jodie_spark.operators.bloom import (
    BloomFilter,
    bloom_filter_new,
    bloom_oracle_sql_positions,
    bloom_positions,
    build_bloom,
    optimal_geometry,
)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_no_false_negatives_and_new_pass(spark):
    docs = _docs(spark)
    seen = docs.filter("doc_id % 3 = 0").selectExpr("md5(text) as fp")
    bloom = build_bloom(seen, "fp")
    assert bloom.n_items == seen.count()
    new = docs.selectExpr("doc_id", "md5(text) as fp")
    kept = bloom_filter_new(new, bloom, "fp")
    # every exactly-seen row is filtered — Bloom never false-negatives
    assert kept.join(seen.distinct(), "fp", "left_semi").count() == 0
    # at this fill ratio fpp ~ 0: everything genuinely new survives
    n_new = new.join(seen.distinct(), "fp", "left_anti").count()
    assert kept.count() == n_new
    # audit direction: probable members = the seen rows
    seen_back = bloom_filter_new(new, bloom, "fp", keep="seen")
    assert seen_back.count() == new.count() - n_new


def test_driver_probe_and_fill_stats(spark):
    seen = _docs(spark).filter("doc_id % 3 = 0").selectExpr("md5(text) as fp")
    bloom = build_bloom(seen, "fp", n_bits=1 << 16, n_hashes=5)
    row = seen.first()
    assert row["fp"] in bloom
    assert "definitely-not-a-fingerprint" not in bloom
    assert 0.0 < bloom.fill_ratio < 0.5
    assert bloom.expected_fpp == bloom.fill_ratio ** 5


def test_positions_match_duckdb_oracle(spark):
    """The Spark codegen arithmetic and the DuckDB SQL emitted by
    bloom_oracle_sql_positions must agree position-for-position —
    that's what makes Bloom membership (false positives included)
    value-oracleable."""
    n_bits, n_hashes = 1 << 20, 7
    rows = (
        _docs(spark)
        .selectExpr("md5(text) as fp")
        .select("fp", bloom_positions(F.col("fp"), n_bits, n_hashes).alias("pos"))
        .limit(64)
        .collect()
    )
    expr = bloom_oracle_sql_positions("fp", n_bits, n_hashes)
    con = duckdb.connect()
    for r in rows:
        got = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS fp)", [r["fp"]]
        ).fetchone()[0]
        assert list(got) == list(r["pos"]), r["fp"]


def test_distributed_build_equals_single_partition(spark):
    seen = _docs(spark).selectExpr("md5(text) as fp")
    wide = build_bloom(seen.repartition(16), "fp", n_bits=1 << 16, n_hashes=4)
    narrow = build_bloom(seen.coalesce(1), "fp", n_bits=1 << 16, n_hashes=4)
    assert wide.bits == narrow.bits
    combined = build_bloom(
        seen.repartition(16), "fp", n_bits=1 << 16, n_hashes=4,
        combine_partitions=2,
    )
    assert combined.bits == wide.bits


def test_probe_plan_has_no_join_or_shuffle(spark):
    seen = _docs(spark).selectExpr("md5(text) as fp")
    bloom = build_bloom(seen, "fp", n_bits=1 << 16, n_hashes=4)
    plan = bloom_filter_new(
        _docs(spark).selectExpr("doc_id", "md5(text) as fp"), bloom, "fp"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan, plan


def test_nulls_and_validation(spark):
    df = spark.createDataFrame([("a",), (None,)], "fp string")
    bloom = build_bloom(df, "fp", n_bits=1 << 10, n_hashes=3)
    assert bloom.n_items == 1  # NULL skipped
    out = bloom_filter_new(df, bloom, "fp")  # NULL tests as new
    assert [r["fp"] for r in out.collect()] == [None]
    with pytest.raises(ValueError, match="multiple of 8"):
        build_bloom(df, "fp", n_bits=1001)
    with pytest.raises(ValueError, match="n_hashes"):
        build_bloom(df, "fp", n_hashes=0)
    with pytest.raises(ValueError, match="keep"):
        bloom_filter_new(df, bloom, "fp", keep="maybe")
    with pytest.raises(ValueError, match="bitmap"):
        BloomFilter(b"\x00" * 10, n_bits=1 << 10, n_hashes=3)


def test_optimal_geometry():
    m, k = optimal_geometry(1_000_000, fpp=1e-3)
    assert m % 8 == 0
    assert 13 <= m / 1_000_000 <= 16  # ~14.4 bits/item at 0.1%
    assert 9 <= k <= 11  # ~10 hashes
    m2, k2 = optimal_geometry(0, fpp=0.5)
    assert m2 >= 8 and k2 >= 1


def test_broadcast_budget_guard(spark):
    """Sizing past broadcast practicality warns and points at the
    persisted indexes (VERDICT r10 item 7); in-budget sizing and an
    explicit budget_bytes=None opt-out stay silent."""
    import warnings

    from jodie_spark.operators.bloom import build_bloom, check_broadcast_budget

    with pytest.warns(ResourceWarning, match="minhash_index_filter_new"):
        optimal_geometry(10_000_000_000, fpp=1e-3)  # ≈ 18 GB bitmap
    with pytest.warns(ResourceWarning):
        check_broadcast_budget(1 << 23, budget_bytes=1 << 10)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        optimal_geometry(1_000_000, fpp=1e-3)  # ~1.7 MB: silent
        check_broadcast_budget(1 << 40, budget_bytes=None)  # opted out
        # ADVICE r11: a deliberately raised/disabled budget must also
        # silence the sizing-time warning, not re-warn with the default
        optimal_geometry(10_000_000_000, fpp=1e-3, broadcast_budget_bytes=None)
        optimal_geometry(
            10_000_000_000, fpp=1e-3, broadcast_budget_bytes=1 << 40
        )
    df = spark.createDataFrame([("a",), ("b",)], "v string")
    with pytest.warns(ResourceWarning):
        bloom = build_bloom(df, "v", n_bits=1 << 13, broadcast_budget_bytes=16)
    assert "a" in bloom and "b" in bloom
