"""Round-14 optimization (VERDICT r13 item 7): batched per-directory
existence checks — ``FileSystem.existing_files`` replaces one
isfile/HEAD RPC per candidate with one LIST page per shared directory
in fsck, vacuum dry-run and restore. These tests pin the helper's
contract on both the base (listdir) and local (scandir) adapters and
the callers' unchanged observable behavior."""

import os

import pytest

from jodie_spark.fs import get_fs
from jodie_spark.tables.table import DeltaTable, write_delta


def test_existing_files_local_exact(tmp_path):
    fs = get_fs(str(tmp_path))
    d = tmp_path / "data"
    d.mkdir()
    have = []
    for i in range(20):
        p = d / f"f{i}.parquet"
        p.write_bytes(b"x")
        have.append(str(p))
    (d / "subdir.parquet").mkdir()  # a directory must NOT count as a file
    missing = [str(d / f"gone{i}.parquet") for i in range(20)]
    dir_cand = str(d / "subdir.parquet")
    other_dir = [str(tmp_path / "nowhere" / "a.parquet")]  # absent dir
    got = fs.existing_files(have + missing + [dir_cand] + other_dir)
    assert got == set(have)


def test_existing_files_small_group_probe_path(tmp_path):
    # below the LIST threshold the single-probe path runs — same answer
    fs = get_fs(str(tmp_path))
    p = tmp_path / "one.bin"
    p.write_bytes(b"x")
    got = fs.existing_files([str(p), str(tmp_path / "two.bin")])
    assert got == {str(p)}


def test_vacuum_dry_run_and_fsck_batched_results_unchanged(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    write_delta(spark.range(100).selectExpr("id", "id % 5 as k"), path)
    t = DeltaTable.forPath(spark, path)
    t.delete("k = 2")  # tombstones the rewritten file(s)
    would = t.vacuum(retention_hours=0.0, dry_run=True)
    assert would and all(os.path.isfile(p) for p in would)
    # delete one live data file out-of-band: fsck must report exactly it
    snap = t.snapshot()
    victim = sorted(snap.files)[0]
    os.remove(os.path.join(path, victim))
    missing = t.fsck(dry_run=True)
    assert missing == [victim]


def test_restore_batched_missing_check_still_raises(spark, tmpdir_path):
    from jodie_spark.errors import DeltaProtocolError

    path = os.path.join(tmpdir_path, "t")
    write_delta(spark.range(50).selectExpr("id", "id % 5 as k"), path)
    t = DeltaTable.forPath(spark, path)
    t.delete("k = 1")
    # physically drop the files only version 0 references, then vacuum
    # bookkeeping aside, restore must refuse
    v0 = t.snapshot(0)
    v1 = t.snapshot()
    gone = set(v0.files) - set(v1.files)
    assert gone
    for p in gone:
        os.remove(os.path.join(path, p))
    with pytest.raises(DeltaProtocolError, match="vacuumed"):
        t.restore(version=0)
    # and with files intact restore succeeds
    path2 = os.path.join(tmpdir_path, "t2")
    write_delta(spark.range(50).selectExpr("id", "id % 5 as k"), path2)
    t2 = DeltaTable.forPath(spark, path2)
    t2.delete("k = 1")
    t2.restore(version=0)
    assert t2.toDF().count() == 50
