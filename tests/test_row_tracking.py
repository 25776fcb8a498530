"""Row tracking (writer feature) + checkpoint state-preservation
regressions: deletion vectors and row-id metadata must survive both
checkpoint writers and the files_df same-version reconciliation."""

import os

import pytest

from jodie_spark.sources.datasource import register
from jodie_spark.tables.table import DeltaTable, write_delta


@pytest.fixture()
def registered(spark):
    register(spark)
    return spark


def _row_ids(spark, p):
    df = spark.read.format("jodie_delta").option("withRowIds", "true").load(p)
    return sorted((r["_row_id"], r["id"], r["_row_commit_version"]) for r in df.collect())


def test_row_ids_unique_contiguous_across_appends(registered, tmpdir_path):
    spark = registered
    p = os.path.join(tmpdir_path, "rt")
    write_delta(
        spark.range(10).selectExpr("id", "id*2 as v").repartition(3),
        p,
        options={"delta.enableRowTracking": "true"},
    )
    write_delta(spark.range(10, 15).selectExpr("id", "id*2 as v"), p, mode="append")
    rows = _row_ids(spark, p)
    assert [r[0] for r in rows] == list(range(15))
    assert sorted({r[2] for r in rows}) == [0, 1]
    proto = DeltaTable.forPath(spark, p).snapshot().protocol
    assert "rowTracking" in (proto.get("writerFeatures") or [])
    assert "domainMetadata" in (proto.get("writerFeatures") or [])


def test_row_id_watermark_survives_checkpoint(registered, tmpdir_path):
    from jodie_spark.tables.log import ROW_TRACKING_DOMAIN, DeltaLog

    spark = registered
    p = os.path.join(tmpdir_path, "rtcp")
    write_delta(
        spark.range(6).selectExpr("id", "id as v"),
        p,
        options={"delta.enableRowTracking": "true"},
    )
    DeltaLog(p).write_checkpoint()
    dm = DeltaLog(p).latest_domain_metadata(ROW_TRACKING_DOMAIN)
    assert dm is not None and '"rowIdHighWaterMark": 5' in dm["configuration"]
    write_delta(spark.range(6, 9).selectExpr("id", "id as v"), p, mode="append")
    assert [r[0] for r in _row_ids(spark, p)] == list(range(9))


def test_row_id_watermark_survives_pyarrow_checkpoint(registered, tmpdir_path):
    from jodie_spark.tables.log import ROW_TRACKING_DOMAIN, DeltaLog

    spark = registered
    p = os.path.join(tmpdir_path, "rtcp2")
    write_delta(
        spark.range(4).selectExpr("id", "id as v"),
        p,
        options={"delta.enableRowTracking": "true"},
    )
    DeltaLog(p).write_checkpoint(spark=False)  # driver-side fallback path
    dm = DeltaLog(p).latest_domain_metadata(ROW_TRACKING_DOMAIN)
    assert dm is not None and '"rowIdHighWaterMark": 3' in dm["configuration"]
    write_delta(spark.range(4, 6).selectExpr("id", "id as v"), p, mode="append")
    assert [r[0] for r in _row_ids(spark, p)] == list(range(6))


def test_row_ids_stable_under_mor_delete(registered, tmpdir_path):
    """DV'd rows disappear; survivors keep their original row ids
    (positions are pre-mask physical indexes)."""
    spark = registered
    p = os.path.join(tmpdir_path, "rtdv")
    write_delta(
        spark.range(10).selectExpr("id", "id as v").coalesce(1),
        p,
        options={"delta.enableRowTracking": "true"},
    )
    before = {r[1]: r[0] for r in _row_ids(spark, p)}  # id -> row_id
    DeltaTable.forPath(spark, p).delete("id % 2 = 1", deletion_vectors=True)
    after = {r[1]: r[0] for r in _row_ids(spark, p)}
    assert set(after) == {0, 2, 4, 6, 8}
    for k, rid in after.items():
        assert rid == before[k]


def test_dv_survives_spark_checkpoint(registered, tmpdir_path):
    spark = registered
    p = os.path.join(tmpdir_path, "dvcp")
    write_delta(spark.range(10).selectExpr("id", "id*2 as v").coalesce(1), p)
    t = DeltaTable.forPath(spark, p)
    t.delete("id % 2 = 1", deletion_vectors=True)
    t.deltaLog.write_checkpoint()
    t2 = DeltaTable.forPath(spark, p)
    assert any(a.get("deletionVector") for a in t2.snapshot().add_files())
    assert sorted(r["id"] for r in t2.toDF().collect()) == [0, 2, 4, 6, 8]
    # second cycle: checkpoint-seeded state must round-trip the DV again
    t2.delete("id = 0", deletion_vectors=True)
    t2.deltaLog.write_checkpoint()
    t3 = DeltaTable.forPath(spark, p)
    assert sorted(r["id"] for r in t3.toDF().collect()) == [2, 4, 6, 8]


def test_dv_survives_pyarrow_checkpoint(registered, tmpdir_path):
    from jodie_spark.tables.log import DeltaLog

    spark = registered
    p = os.path.join(tmpdir_path, "dvcp2")
    write_delta(spark.range(8).selectExpr("id", "id*2 as v").coalesce(1), p)
    t = DeltaTable.forPath(spark, p)
    t.delete("id < 3", deletion_vectors=True)
    DeltaLog(p).write_checkpoint(spark=False)
    t2 = DeltaTable.forPath(spark, p)
    assert sorted(r["id"] for r in t2.toDF().collect()) == [3, 4, 5, 6, 7]


def test_files_df_mor_same_version_tiebreak(registered, tmpdir_path):
    """A MoR commit removes and re-adds the same path in one version —
    the re-add must win the Spark-side reconciliation."""
    from jodie_spark.tables.distribution import files_df

    spark = registered
    p = os.path.join(tmpdir_path, "tiebrk")
    write_delta(spark.range(6).selectExpr("id", "id as v").coalesce(1), p)
    DeltaTable.forPath(spark, p).delete("id = 0", deletion_vectors=True)
    fdf = files_df(spark, p)
    rows = fdf.collect()
    assert len(rows) == 1  # the file is still live


def test_concurrent_row_id_allocation_conflicts(registered, tmpdir_path):
    """Two writers allocating from the same watermark must not both
    commit (ids would collide): the loser raises."""
    from jodie_spark.errors import ConcurrentModificationException
    from jodie_spark.tables.log import DeltaLog
    from jodie_spark.tables.writer import write_data_files

    spark = registered
    p = os.path.join(tmpdir_path, "rtrace")
    write_delta(
        spark.range(3).selectExpr("id", "id as v"),
        p,
        options={"delta.enableRowTracking": "true"},
    )
    log = DeltaLog(p)
    v = log.latest_version()
    adds_a = write_data_files(spark.range(3, 5).selectExpr("id", "id as v"), p, [])
    adds_b = write_data_files(spark.range(5, 7).selectExpr("id", "id as v"), p, [])
    # writer A commits from read_version v
    log.commit(v, [{"add": a} for a in adds_a], "WRITE", {}, {})
    # writer B also read at v: its domain bump conflicts with A's
    with pytest.raises(ConcurrentModificationException, match="domain metadata"):
        log.commit(v, [{"add": a} for a in adds_b], "WRITE", {}, {})


# ---------------------------------------------------------------------------
# in-commit timestamps (write side)
# ---------------------------------------------------------------------------

def test_in_commit_timestamps_written_and_monotonic(registered, tmpdir_path):
    import json as _json

    from jodie_spark.tables.log import DeltaLog, commit_file_name

    spark = registered
    p = os.path.join(tmpdir_path, "ict")
    write_delta(
        spark.range(3).selectExpr("id", "id as v"),
        p,
        options={"delta.enableInCommitTimestamps": "true"},
    )
    t = DeltaTable.forPath(spark, p)
    t.delete("id = 0")
    write_delta(spark.range(3, 5).selectExpr("id", "id as v"), p, mode="append")
    log = DeltaLog(p)
    icts = []
    for v in range(log.latest_version() + 1):
        with open(os.path.join(log.log_path, commit_file_name(v))) as fh:
            for line in fh:
                a = _json.loads(line)
                if "commitInfo" in a:
                    icts.append(a["commitInfo"].get("inCommitTimestamp"))
    assert all(x is not None for x in icts)
    assert icts == sorted(icts) and len(set(icts)) == len(icts)  # strictly increasing
    proto = t.snapshot().protocol
    assert "inCommitTimestamp" in proto["writerFeatures"]
    # timestamp-based time travel prefers the monotonic clock
    assert log.version_at_timestamp(icts[1]) == 1
