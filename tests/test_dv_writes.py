"""Merge-on-read DELETE via deletion vectors (write side)."""

import glob
import os

import pytest

from jodie_spark.tables.table import DeltaTable, write_delta


@pytest.fixture()
def table(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "t")
    write_delta(spark.range(1000).selectExpr("id", "id % 10 as m"), p)
    return DeltaTable.forPath(spark, p)


def test_dv_delete_leaves_files_in_place(spark, table):
    n_files = len(glob.glob(table.path + "/*.parquet"))
    table.delete("m = 3", deletion_vectors=True)
    assert table.toDF().count() == 900
    assert len(glob.glob(table.path + "/*.parquet")) == n_files  # no rewrite
    assert glob.glob(table.path + "/deletion_vectors/*.bin")
    m = table.history().collect()[0]["operationMetrics"]
    assert m["numDeletedRows"] == "100"
    assert m["numRemovedFiles"] == "0"
    assert int(m["numDeletionVectorsAdded"]) > 0


def test_dv_delete_upgrades_protocol(spark, table):
    table.delete("m = 0", deletion_vectors=True)
    proto = table.snapshot().protocol
    assert proto["minReaderVersion"] == 3 and proto["minWriterVersion"] == 7
    assert "deletionVectors" in proto["readerFeatures"]
    assert "deletionVectors" in proto["writerFeatures"]


def test_dv_delete_merges_and_is_idempotent(spark, table):
    table.delete("m = 3", deletion_vectors=True)
    table.delete("m = 5", deletion_vectors=True)
    assert table.toDF().count() == 800
    table.delete("m = 5", deletion_vectors=True)  # re-delete: true no-op
    assert table.toDF().count() == 800
    m = table.history().collect()[0]["operationMetrics"]
    assert m["numDeletedRows"] == "0"
    # already-deleted rows are anti-filtered before matching, so the
    # re-delete rewrites no DV at all (metadata-only commit)
    assert m["numDeletionVectorsAdded"] == "0"
    # overlapping (not identical) predicate still merges into the DVs
    table.delete("m in (5, 7)", deletion_vectors=True)
    assert table.toDF().count() == 700
    m2 = table.history().collect()[0]["operationMetrics"]
    assert m2["numDeletedRows"] == "100"
    assert int(m2["numDeletionVectorsUpdated"]) > 0


def test_rewrite_dml_on_dv_table_drops_dvs_without_resurrection(spark, table):
    table.delete("m = 3", deletion_vectors=True)
    # update rewrites touched files; DV-deleted rows must NOT come back
    table.update("id = 4", {"m": "99"})
    assert table.toDF().count() == 900
    assert table.toDF().filter("m = 3").count() == 0
    assert table.toDF().filter("m = 99").count() == 1
    # compaction purges DVs entirely (delta parity)
    table.optimize().executeCompaction()
    assert table.toDF().count() == 900
    latest = table.snapshot().add_files()
    assert all(not a.get("deletionVector") for a in latest)


def test_dv_delete_no_matches_is_metadata_only(spark, table):
    v0 = table.deltaLog.latest_version()
    table.delete("m = 42", deletion_vectors=True)
    assert table.toDF().count() == 1000
    m = table.history().collect()[0]["operationMetrics"]
    assert m["numDeletedRows"] == "0"
    assert table.deltaLog.latest_version() == v0 + 1


def test_dv_delete_composes_with_cdf(spark, tmpdir_path):
    """MoR delete writes DVs AND delete change rows from the matched scan."""
    import glob as _glob

    from jodie_spark.operators.cdf import read_cdf

    p = os.path.join(tmpdir_path, "cdf")
    write_delta(
        spark.range(100).selectExpr("id", "id % 5 as m"),
        p,
        options={"delta.enableChangeDataFeed": "true"},
    )
    t = DeltaTable.forPath(spark, p)
    t.delete("m = 1", deletion_vectors=True)
    assert t.toDF().count() == 80
    assert _glob.glob(p + "/deletion_vectors/*.bin")  # genuinely MoR
    changes = read_cdf(spark, p, 1, 1).filter("_change_type = 'delete'")
    assert changes.count() == 20
    # MoR update with CDF: pre/post images recorded
    t.update("m = 2", {"m": "22"}, deletion_vectors=True)
    ch = read_cdf(spark, p, 2, 2)
    assert ch.filter("_change_type = 'update_preimage'").count() == 20
    assert ch.filter("_change_type = 'update_postimage' and m = 22").count() == 20


def test_dv_delete_readable_through_datasource(spark, table):
    from jodie_spark.sources.datasource import register

    table.delete("m = 7", deletion_vectors=True)
    register(spark)
    df = spark.read.format("jodie_delta").load(table.path)
    assert df.count() == 900
    assert df.filter("m = 7").count() == 0


def test_dv_update_writes_only_matched_rows(spark, table):
    n_files = len(glob.glob(table.path + "/*.parquet"))
    table.update("m = 3", {"m": "33"}, deletion_vectors=True)
    df = table.toDF()
    assert df.count() == 1000
    assert df.filter("m = 33").count() == 100
    assert df.filter("m = 3").count() == 0
    m = table.history().collect()[0]["operationMetrics"]
    assert m["numUpdatedRows"] == "100"
    assert m["numRemovedFiles"] == "0"  # no rewrite of untouched rows
    assert int(m["numDeletionVectorsAdded"]) > 0


def test_dv_update_does_not_resurrect_deleted_rows(spark, table):
    table.delete("m = 5", deletion_vectors=True)
    table.update("id < 100", {"m": "77"}, deletion_vectors=True)
    assert table.toDF().count() == 900
    # ids 0..99 minus the 10 already-deleted (m=5) rows
    assert table.toDF().filter("m = 77").count() == 90
    m = table.history().collect()[0]["operationMetrics"]
    assert m["numUpdatedRows"] == "90"


def test_dv_update_enforces_constraints(spark, table):
    t = DeltaTable.forPath(spark, table.path)
    t.add_check_constraint("m_small", "m < 100")
    with pytest.raises(Exception, match="m_small"):
        t.update("m = 3", {"m": "200"}, deletion_vectors=True)
    assert t.toDF().filter("m = 200").count() == 0
    assert t.toDF().count() == 1000  # nothing committed


def test_mor_merge_full_clause_set(spark, table):
    src = spark.createDataFrame(
        [(5, -1), (7, -1), (2000, 42)], ["id", "m"]
    )
    (
        table.alias("tg")
        .merge(src.alias("s"), "tg.id = s.id")
        .whenMatchedDelete("s.m < 0 and tg.id = 7")
        .whenMatchedUpdate(set={"m": "s.m"})
        .whenNotMatchedInsertAll()
        .execute(deletion_vectors=True)
    )
    df = table.toDF()
    assert df.count() == 1000  # -1 delete, +1 insert
    assert df.filter("id = 7").count() == 0
    assert df.filter("id = 5").collect()[0]["m"] == -1
    assert df.filter("id = 2000").collect()[0]["m"] == 42
    m = table.history().collect()[0]["operationMetrics"]
    assert (m["numTargetRowsUpdated"], m["numTargetRowsDeleted"], m["numTargetRowsInserted"]) == ("1", "1", "1")
    assert m["numTargetFilesRemoved"] == "0"
    assert int(m["numDeletionVectorsAdded"]) > 0


def test_mor_merge_multi_match_guard(spark, table):
    from jodie_spark.errors import MergeMultipleMatchesError

    dup = spark.createDataFrame([(5, 1), (5, 2)], ["id", "m"])
    with pytest.raises(MergeMultipleMatchesError):
        (
            table.alias("tg")
            .merge(dup.alias("s"), "tg.id = s.id")
            .whenMatchedUpdate(set={"m": "s.m"})
            .execute(deletion_vectors=True)
        )
    assert table.toDF().count() == 1000  # nothing committed


def test_mor_merge_stacks_on_mor_delete(spark, table):
    table.delete("m = 3", deletion_vectors=True)  # 900 rows live
    # id=3 is DV-deleted (3 % 10 == 3); id=14 is live
    src = spark.createDataFrame([(3, 0), (14, 0)], ["id", "m"])
    (
        table.alias("tg")
        .merge(src.alias("s"), "tg.id = s.id")
        .whenMatchedUpdate(set={"m": "99"})
        .whenNotMatchedInsertAll()
        .execute(deletion_vectors=True)
    )
    df = table.toDF()
    # id=3 was DV-deleted → NOT matched → re-inserted with m=0;
    # id=14 matched → updated to 99
    assert df.count() == 901
    assert df.filter("id = 3").collect()[0]["m"] == 0
    assert df.filter("id = 14").collect()[0]["m"] == 99


def test_vacuum_sweeps_orphaned_dv_files(spark, table):
    table.delete("m = 3", deletion_vectors=True)
    table.delete("m = 5", deletion_vectors=True)  # supersedes the first DVs
    dv_dir = table.path + "/deletion_vectors"
    n_before = len(glob.glob(dv_dir + "/*.bin"))
    assert n_before > len(table.snapshot().add_files()) - 1  # orphans exist
    listed = table.vacuum(retention_hours=0, dry_run=True)
    assert any("deletion_vectors" in p for p in listed)
    table.vacuum(retention_hours=0)
    live = {
        a["deletionVector"]["pathOrInlineDv"]
        for a in table.snapshot().add_files()
        if a.get("deletionVector")
    }
    remaining = set(glob.glob(dv_dir + "/*.bin"))
    assert remaining == {p for p in live}  # only live DVs survive
    assert table.toDF().count() == 800  # reads intact after the sweep


def test_dedup_operators_ride_deletion_vectors(spark, tmpdir_path):
    from jodie_spark.operators.dedup import (
        kill_duplicate_records,
        remove_duplicate_records,
    )
    from jodie_spark.tables.table import write_delta

    p = os.path.join(tmpdir_path, "dvdedup")
    rows = [(i, i % 7, "x") for i in range(50)] + [(100 + i, i, "x") for i in range(3)]
    write_delta(spark.createDataFrame(rows, ["pk", "k", "v"]), p)
    t = DeltaTable.forPath(spark, p)
    n_files = len(glob.glob(p + "/*.parquet"))
    kill_duplicate_records(t, ["k", "v"], deletion_vectors=True)
    # every k in 0..6 occurs >= 7 times → all killed; nothing rewritten
    assert t.toDF().count() == 0
    assert len(glob.glob(p + "/*.parquet")) == n_files
    m = t.history().collect()[0]["operationMetrics"]
    assert int(m["numDeletionVectorsAdded"]) > 0

    p2 = os.path.join(tmpdir_path, "dvdedup2")
    write_delta(spark.createDataFrame(rows, ["pk", "k", "v"]), p2)
    t2 = DeltaTable.forPath(spark, p2)
    remove_duplicate_records(t2, ["k"], primary_key="pk", deletion_vectors=True)
    assert t2.toDF().count() == 7  # one survivor per k
    assert t2.toDF().groupBy("k").count().filter("count > 1").count() == 0


def test_reorg_purge_materializes_deletions(spark, table):
    table.delete("m = 3", deletion_vectors=True)
    table.delete("m = 5", deletion_vectors=True)
    assert table.reorg_purge() > 0
    snap = table.snapshot()
    assert all(not a.get("deletionVector") for a in snap.add_files())
    assert table.toDF().count() == 800
    assert table.toDF().filter("m in (3, 5)").count() == 0
    h = table.history().collect()[0]
    assert h["operation"] == "REORG"
    # purge + vacuum releases both old data files and DV bitmaps
    table.vacuum(retention_hours=0)
    assert glob.glob(table.path + "/deletion_vectors/*.bin") == []
    assert table.toDF().count() == 800
    # idempotent: nothing left to purge
    assert table.reorg_purge() == 0


def test_restore_undoes_mor_delete(spark, tmpdir_path):
    """RESTORE across a deletion-vector commit must resurrect the DV'd
    rows: same path, different add payload — the by-path diff alone
    would miss it (regression from the log-replay fuzz)."""
    import os as _os

    from jodie_spark.tables.table import DeltaTable, write_delta

    p = _os.path.join(tmpdir_path, "restdv")
    write_delta(spark.range(10).selectExpr("id", "id as v").coalesce(1), p)
    t = DeltaTable.forPath(spark, p)
    t.delete("id % 2 = 1", deletion_vectors=True)
    assert t.toDF().count() == 5
    t.restore(0)
    t2 = DeltaTable.forPath(spark, p)
    assert sorted(r["id"] for r in t2.toDF().collect()) == list(range(10))
    # and restoring FORWARD to the DV state works too (DV file intact)
    t2.restore(1)
    assert DeltaTable.forPath(spark, p).toDF().count() == 5


def test_mor_dml_on_column_mapped_table(spark, tmpdir_path):
    """Round 4: deletion-vector DELETE/UPDATE work on column-mapped
    tables (previously forced copy-on-write): the coordinate scan reads
    physical names, conditions evaluate on logical names, and updated
    copies are written physical-named."""
    import os

    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "mor_mapped")
    write_delta(
        spark.range(10).selectExpr("id", "id as v").coalesce(1),
        p,
        options={"delta.columnMapping.mode": "name"},
    )
    t = DeltaTable.forPath(spark, p)
    t.rename_column("v", "val")
    t = DeltaTable.forPath(spark, p)
    t.delete("id % 2 = 1", deletion_vectors=True)
    snap = DeltaTable.forPath(spark, p).snapshot()
    assert any(a.get("deletionVector") for a in snap.add_files())  # genuinely MoR, not a CoW fallback
    rows = sorted((r["id"], r["val"]) for r in DeltaTable.forPath(spark, p).toDF().collect())
    assert rows == [(0, 0), (2, 2), (4, 4), (6, 6), (8, 8)]

    DeltaTable.forPath(spark, p).update(
        "id = 2", {"val": "val + 100"}, deletion_vectors=True
    )
    rows = sorted((r["id"], r["val"]) for r in DeltaTable.forPath(spark, p).toDF().collect())
    assert rows == [(0, 0), (2, 102), (4, 4), (6, 6), (8, 8)]
    # REORG purges the DVs and keeps values
    DeltaTable.forPath(spark, p).reorg_purge()
    t2 = DeltaTable.forPath(spark, p)
    assert not any(a.get("deletionVector") for a in t2.snapshot().add_files())
    rows = sorted((r["id"], r["val"]) for r in t2.toDF().collect())
    assert rows == [(0, 0), (2, 102), (4, 4), (6, 6), (8, 8)]
