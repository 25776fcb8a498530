"""Liquid clustering: clusterBy metadata, OPTIMIZE re-clustering,
ALTER CLUSTER BY, protocol features."""

import json
import os

import pytest

from jodie_spark.errors import JodieValidationError
from jodie_spark.tables.table import DeltaTable, write_delta


def _minmax(t, col):
    out = []
    for a in t.snapshot().add_files():
        st = json.loads(a["stats"])
        out.append((int(st["minValues"][col]), int(st["maxValues"][col])))
    return sorted(out)


def test_create_clustered_table_metadata_and_protocol(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "ct")
    write_delta(
        spark.range(100).selectExpr("id", "id % 10 as b"), p, cluster_by=["b", "id"]
    )
    t = DeltaTable.forPath(spark, p)
    assert t.cluster_by() == ["b", "id"]
    proto = t.snapshot().protocol
    assert "clustering" in proto["writerFeatures"]
    assert "domainMetadata" in proto["writerFeatures"]
    assert int(proto["minWriterVersion"]) == 7


def test_optimize_reclusters_clustered_table(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "copt")
    write_delta(
        spark.range(0, 1000).selectExpr("id", "id % 7 as v"),
        p,
        cluster_by=["id"],
    )
    # append shuffled batches so files interleave id ranges
    for lo in (1000, 2000):
        write_delta(
            spark.range(lo, lo + 1000)
            .selectExpr("id", "id % 7 as v")
            .repartition(4),
            p,
            mode="append",
        )
    t = DeltaTable.forPath(spark, p)
    t.optimize().executeCompaction(target_file_size=20_000)
    # post-optimize files have non-overlapping id ranges (range clustering)
    ranges = _minmax(t, "id")
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
    # data intact
    assert t.toDF().count() == 3000
    assert t.history(1).collect()[0]["operation"] == "OPTIMIZE"


def test_alter_cluster_by_and_drop(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "alt")
    write_delta(spark.range(10).selectExpr("id", "id % 2 as b"), p)
    t = DeltaTable.forPath(spark, p)
    assert t.cluster_by() == []
    t.set_cluster_by(["b"])
    t = DeltaTable.forPath(spark, p)
    assert t.cluster_by() == ["b"]
    # protocol upgraded in the same commit
    assert "clustering" in t.snapshot().protocol["writerFeatures"]
    assert t.history(1).collect()[0]["operation"] == "CLUSTER BY"
    t.set_cluster_by([])
    assert DeltaTable.forPath(spark, p).cluster_by() == []
    with pytest.raises(JodieValidationError, match="not in table"):
        t.set_cluster_by(["nope"])


def test_cluster_by_create_guards(spark, tmpdir_path):
    df = spark.range(5).selectExpr("id", "id % 2 as b")
    with pytest.raises(JodieValidationError, match="mutually exclusive"):
        write_delta(
            df, os.path.join(tmpdir_path, "x"), cluster_by=["id"], partition_by=["b"]
        )
    with pytest.raises(JodieValidationError, match="not in data"):
        write_delta(df, os.path.join(tmpdir_path, "y"), cluster_by=["zz"])
    write_delta(df, os.path.join(tmpdir_path, "z"))
    with pytest.raises(JodieValidationError, match="table creation"):
        write_delta(df, os.path.join(tmpdir_path, "z"), mode="append", cluster_by=["id"])


def test_clustering_domain_survives_checkpoint(spark, tmpdir_path):
    from jodie_spark.tables.log import DeltaLog

    p = os.path.join(tmpdir_path, "cp")
    write_delta(spark.range(20).selectExpr("id", "id as v"), p, cluster_by=["id"])
    write_delta(spark.range(20, 30).selectExpr("id", "id as v"), p, mode="append")
    DeltaLog(p).write_checkpoint()
    assert DeltaTable.forPath(spark, p).cluster_by() == ["id"]
