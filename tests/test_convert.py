"""convert_to_delta: in-place log creation over existing parquet."""

import os

import pytest

from jodie_spark.errors import JodieValidationError
from jodie_spark.sources import convert_to_delta


def test_convert_unpartitioned(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "plain")
    spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string").write.parquet(p)
    t = convert_to_delta(spark, p)
    assert sorted((r["k"], r["v"]) for r in t.toDF().collect()) == [(1, "a"), (2, "b")]
    # the converted table is fully operational (delete works, stats exist)
    t.delete("k = 1")
    assert [r["k"] for r in t.toDF().collect()] == [2]


def test_convert_partitioned(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "part")
    df = spark.createDataFrame([(i, "p%d" % (i % 2)) for i in range(6)], "k int, p string")
    df.write.partitionBy("p").parquet(p)
    t = convert_to_delta(spark, p, partition_columns=["p"])
    assert t.snapshot().partition_columns == ["p"]
    assert t.toDF().count() == 6
    # partition pruning works from directory-derived values
    t.delete("p = 'p0'")
    assert sorted(set(r["p"] for r in t.toDF().collect())) == ["p1"]


def test_convert_errors(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "empty")
    os.makedirs(p)
    with pytest.raises(JodieValidationError):
        convert_to_delta(spark, p)
    p2 = os.path.join(tmpdir_path, "already")
    spark.createDataFrame([(1,)], "k int").write.parquet(p2)
    convert_to_delta(spark, p2)
    with pytest.raises(JodieValidationError):
        convert_to_delta(spark, p2)
    p3 = os.path.join(tmpdir_path, "mismatch")
    spark.createDataFrame([(1, "x")], "k int, p string").write.partitionBy("p").parquet(p3)
    with pytest.raises(JodieValidationError):
        convert_to_delta(spark, p3)  # partition dirs present but not declared
