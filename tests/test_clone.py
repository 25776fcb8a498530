"""Shallow clone: zero-copy metadata clone with copy-on-write isolation."""

import glob
import os

import pytest

from jodie_spark.errors import JodieValidationError
from jodie_spark.operators.helpers import shallow_clone  # noqa: F401
from jodie_spark.tables.table import DeltaTable, write_delta


@pytest.fixture()
def src_table(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "src")
    write_delta(
        spark.range(90).selectExpr("id", "cast(id % 3 as string) p"),
        p,
        partition_by=["p"],
    )
    return DeltaTable.forPath(spark, p)


def _parquets(path):
    return glob.glob(path + "/**/*.parquet", recursive=True)


def test_clone_is_zero_copy_and_reads_source(spark, tmpdir_path, src_table):
    tgt = os.path.join(tmpdir_path, "clone")
    c = shallow_clone(src_table, tgt)
    assert len(_parquets(tgt)) == 0  # metadata only, no data files copied
    assert c.toDF().count() == 90
    # partition column reconstructed from the log's partitionValues
    assert sorted(r[0] for r in c.toDF().select("p").distinct().collect()) == ["0", "1", "2"]
    assert {r["operation"] for r in c.history().collect()} == {"CLONE"}


def test_clone_writes_are_isolated(spark, tmpdir_path, src_table):
    tgt = os.path.join(tmpdir_path, "clone")
    c = shallow_clone(src_table, tgt)
    n_src = len(_parquets(src_table.path))
    c.delete("p = '0'")
    write_delta(
        spark.createDataFrame([(999, "9")], ["id", "p"]), tgt, mode="append"
    )
    assert DeltaTable.forPath(spark, tgt).toDF().count() == 61
    # source untouched
    assert src_table.toDF().count() == 90
    assert len(_parquets(src_table.path)) == n_src


def test_clone_vacuum_never_deletes_source_files(spark, tmpdir_path, src_table):
    tgt = os.path.join(tmpdir_path, "clone")
    c = shallow_clone(src_table, tgt)
    c.delete("p = '1'")  # tombstones absolute source paths
    n_src = len(_parquets(src_table.path))
    c.vacuum(retention_hours=0)
    assert len(_parquets(src_table.path)) == n_src
    assert src_table.toDF().count() == 90
    assert DeltaTable.forPath(spark, tgt).toDF().count() == 60


def test_clone_refuses_existing_target(spark, tmpdir_path, src_table):
    tgt = os.path.join(tmpdir_path, "occupied")
    write_delta(spark.range(1), tgt)
    with pytest.raises(JodieValidationError, match="already exists"):
        shallow_clone(src_table, tgt)


def test_clone_update_rewrites_into_clone_dir(spark, tmpdir_path, src_table):
    tgt = os.path.join(tmpdir_path, "clone")
    c = shallow_clone(src_table, tgt)
    c.update("id = 5", {"id": "500"})
    # the rewrite landed under the clone, not the source
    assert len(_parquets(tgt)) > 0
    assert DeltaTable.forPath(spark, tgt).toDF().filter("id = 500").count() == 1
    assert src_table.toDF().filter("id = 500").count() == 0


def test_shallow_clone_version_as_of(spark, tmpdir_path):
    """Versioned shallow clone: the clone sees exactly the source's
    HISTORICAL file set, while the source and a head clone keep the
    current state; SQL surface included."""
    import os

    from jodie_spark import sql
    from jodie_spark.tables.table import DeltaTable, write_delta

    src = os.path.join(tmpdir_path, "vsrc")
    write_delta(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), src)
    t = DeltaTable.forPath(spark, src)
    t.delete("k = 1")                      # v1
    write_delta(
        spark.createDataFrame([(3, "c")], "k int, v string"), src, mode="append"
    )                                      # v2

    c0 = shallow_clone(DeltaTable.forPath(spark, src), os.path.join(tmpdir_path, "v0"), version=0)
    assert sorted(r["k"] for r in c0.toDF().collect()) == [1, 2]
    c1 = shallow_clone(DeltaTable.forPath(spark, src), os.path.join(tmpdir_path, "v1"), version=1)
    assert sorted(r["k"] for r in c1.toDF().collect()) == [2]
    # head clone unchanged behavior
    ch = shallow_clone(DeltaTable.forPath(spark, src), os.path.join(tmpdir_path, "vh"))
    assert sorted(r["k"] for r in ch.toDF().collect()) == [2, 3]
    # history records the cloned source version
    assert c0.history(1).collect()[0]["operationParameters"]["sourceVersion"] == "0"
    # SQL surface
    p2 = os.path.join(tmpdir_path, "vsql")
    sql(spark, f"CREATE TABLE delta.`{p2}` SHALLOW CLONE delta.`{src}` VERSION AS OF 1")
    assert sorted(
        r["k"] for r in DeltaTable.forPath(spark, p2).toDF().collect()
    ) == [2]
    # writes to the versioned clone never touch the source
    c0.delete("k = 2")
    assert sorted(r["k"] for r in DeltaTable.forPath(spark, src).toDF().collect()) == [2, 3]
    # TIMESTAMP AS OF resolves through the commit clock (v0's stamp)
    hist = {r["version"]: r["timestamp"] for r in t.history().collect()}
    ts0 = hist[0].isoformat()
    ct = shallow_clone(
        DeltaTable.forPath(spark, src), os.path.join(tmpdir_path, "vts"),
        timestamp=ts0,
    )
    assert sorted(r["k"] for r in ct.toDF().collect()) == [1, 2]
    p3 = os.path.join(tmpdir_path, "vtsql")
    sql(spark, f"CREATE TABLE delta.`{p3}` SHALLOW CLONE delta.`{src}` "
               f"TIMESTAMP AS OF '{ts0}'")
    assert sorted(
        r["k"] for r in DeltaTable.forPath(spark, p3).toDF().collect()
    ) == [1, 2]
