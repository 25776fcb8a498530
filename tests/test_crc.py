"""Version checksums (<version>.crc, delta-spark's VersionChecksum):
written incrementally per commit, verified on snapshot, healed at
checkpoints, cleaned up with their commit JSONs."""

import json
import os
import time

import pytest

from jodie_spark.errors import DeltaProtocolError
from jodie_spark.tables.log import DeltaLog
from jodie_spark.tables.table import DeltaTable, write_delta


def _crc(log, v):
    p = log._crc_path(v)
    assert os.path.exists(p), f"missing {p}"
    with open(p) as fh:
        return json.loads(fh.read())


def test_crc_written_incrementally_and_accurate(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "t")
    write_delta(spark.range(10).selectExpr("id", "id * 2 as v"), p)
    write_delta(spark.range(10, 15).selectExpr("id", "id * 2 as v"), p, mode="append")
    t = DeltaTable.forPath(spark, p)
    t.delete("id < 3")
    t.update("id = 12", {"v": "0"})
    log = DeltaLog(p)
    for v in range(4):
        snap = log.snapshot(v)
        files = snap.add_files()
        crc = _crc(log, v)
        assert crc["numFiles"] == len(files)
        assert crc["tableSizeBytes"] == sum(int(a["size"]) for a in files)
        assert crc["metadata"]["schemaString"] == snap.metadata["schemaString"]
        assert crc["protocol"] == snap.protocol


def test_crc_mismatch_warns_without_mutating_and_heals(spark, tmpdir_path):
    """Default posture is delta-spark's: VersionChecksum is ADVISORY.
    A drifted .crc warns (once per process per version), the table
    stays readable, and — crucially — the READ path leaves the table
    directory untouched: the mismatch may be a replay bug in THIS
    engine, and a rename would destroy a correct foreign writer's
    checksum (round-6 advice). The next checkpoint — a writer-side
    moment — verifies the .crc against the state it reconstructs and
    rewrites drifted files."""
    p = os.path.join(tmpdir_path, "t")
    write_delta(
        spark.range(5).selectExpr("id"),
        p,
        options={"delta.checkpointInterval": "2"},
    )
    log = DeltaLog(p)
    crc = _crc(log, 0)
    crc["numFiles"] += 1
    drifted = json.dumps(crc)
    with open(log._crc_path(0), "w") as fh:
        fh.write(drifted)
    t = DeltaTable.forPath(spark, p)
    with pytest.warns(RuntimeWarning, match="checksum mismatch"):
        assert t.toDF().count() == 5
    # READ path mutated nothing: the .crc is byte-identical, in place
    with open(log._crc_path(0)) as fh:
        assert fh.read() == drifted
    assert not os.path.exists(log._crc_path(0) + ".quarantined")
    # same handle → no repeat warning (in-memory suppression)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        assert t.snapshot(0).version == 0
    # checkpoint at v2 (interval=2) verifies + rewrites the drifted
    # .crc for the checkpointed version; later chain entries are exact
    write_delta(spark.range(5, 6).selectExpr("id"), p, mode="append")  # v1
    write_delta(spark.range(6, 7).selectExpr("id"), p, mode="append")  # v2
    assert _crc(log, 2)["numFiles"] == len(log.snapshot(2).add_files())
    write_delta(spark.range(7, 8).selectExpr("id"), p, mode="append")  # v3
    assert _crc(log, 3)["numFiles"] == len(log.snapshot(3).add_files())


def test_crc_checkpoint_heal_rewrites_drifted_checkpoint_version(spark, tmpdir_path):
    """A .crc that is drifted AT the checkpoint version itself is
    rewritten by the checkpoint's heal pass (the heal now verifies
    existing checksums against reconstructed state instead of only
    filling in missing ones)."""
    p = os.path.join(tmpdir_path, "t")
    write_delta(spark.range(4).selectExpr("id"), p)
    write_delta(spark.range(4, 8).selectExpr("id"), p, mode="append")  # v1
    log = DeltaLog(p)
    crc = _crc(log, 1)
    good_files = crc["numFiles"]
    crc["numFiles"] += 3
    with open(log._crc_path(1), "w") as fh:
        fh.write(json.dumps(crc))
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")  # heal replays → advisory warning ok
        log.write_checkpoint(1)
        log._restart_checksum_chain(1)
    assert _crc(log, 1)["numFiles"] == good_files


def test_crc_mismatch_strict_property_fails_loudly(spark, tmpdir_path):
    """jodie.checksumValidation=strict restores the hard failure."""
    p = os.path.join(tmpdir_path, "t")
    write_delta(
        spark.range(5).selectExpr("id"),
        p,
        options={"jodie.checksumValidation": "strict"},
    )
    log = DeltaLog(p)
    crc = _crc(log, 0)
    crc["numFiles"] += 1
    with open(log._crc_path(0), "w") as fh:
        fh.write(json.dumps(crc))
    with pytest.raises(DeltaProtocolError, match="checksum mismatch"):
        DeltaTable.forPath(spark, p).snapshot()
    # strict never quarantines: the bad .crc stays for forensics
    assert os.path.exists(log._crc_path(0))


def test_foreign_crc_is_verified(spark, tmpdir_path):
    """A .crc written by a foreign engine participates in verification:
    a correct one reads clean, a size-lying one fails."""
    from tests.interop_golden import commit_info, part_name, write_commit, write_parquet
    from tests.test_interop import _meta

    t = os.path.join(tmpdir_path, "foreign_crc")
    a = write_parquet(t, part_name(0), {"id": [1, 2, 3]})
    meta = _meta([("id", "long")])
    write_commit(
        t,
        0,
        [
            commit_info("WRITE", {"mode": "ErrorIfExists", "partitionBy": "[]"}),
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            meta,
            {"add": a},
        ],
    )
    good = {
        "tableSizeBytes": a["size"],
        "numFiles": 1,
        "numMetadata": 1,
        "numProtocol": 1,
        "metadata": meta["metaData"],
        "protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
    }
    crc_path = os.path.join(t, "_delta_log", "%020d.crc" % 0)
    with open(crc_path, "w") as fh:
        fh.write(json.dumps(good))
    assert sorted(r["id"] for r in DeltaTable.forPath(spark, t).toDF().collect()) == [1, 2, 3]
    bad = dict(good, tableSizeBytes=good["tableSizeBytes"] + 99)
    with open(crc_path, "w") as fh:
        fh.write(json.dumps(bad))
    # a size-lying FOREIGN .crc must never make the table unreadable
    # (delta-spark has shipped incremental-CRC drift bugs): advisory
    # warn, rows still served from the replayed log — and the foreign
    # writer's file is left exactly as it was (read path never mutates
    # the shared directory; round-6 advice)
    with pytest.warns(RuntimeWarning, match="tableSizeBytes"):
        assert sorted(
            r["id"] for r in DeltaTable.forPath(spark, t).toDF().collect()
        ) == [1, 2, 3]
    with open(crc_path) as fh:
        assert json.loads(fh.read()) == bad
    assert not os.path.exists(crc_path + ".quarantined")


def test_crc_chain_heals_at_checkpoint(spark, tmpdir_path):
    """Delete the .crc files (adopted/foreign table shape): subsequent
    commits skip the checksum (chain broken, O(actions) stays cheap),
    and the next checkpoint — already O(state) — restarts it."""
    p = os.path.join(tmpdir_path, "t")
    write_delta(
        spark.range(3).selectExpr("id"),
        p,
        options={"delta.checkpointInterval": "3"},
    )
    log = DeltaLog(p)
    os.remove(log._crc_path(0))
    write_delta(spark.range(3, 6).selectExpr("id"), p, mode="append")  # v1
    assert not os.path.exists(log._crc_path(1))  # chain broken → skipped
    write_delta(spark.range(6, 9).selectExpr("id"), p, mode="append")  # v2
    write_delta(spark.range(9, 12).selectExpr("id"), p, mode="append")  # v3 → checkpoint
    crc = _crc(log, 3)
    snap = log.snapshot(3)
    assert crc["numFiles"] == len(snap.add_files())
    # and the chain continues incrementally after the heal
    write_delta(spark.range(12, 13).selectExpr("id"), p, mode="append")  # v4
    assert _crc(log, 4)["numFiles"] == len(log.snapshot(4).add_files())


def test_cleanup_deletes_crc_with_commit(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "t")
    write_delta(
        spark.range(3).selectExpr("id"),
        p,
        options={"delta.logRetentionDuration": "interval 30 minutes"},
    )
    for i in range(3):
        write_delta(spark.range(i, i + 1).selectExpr("id"), p, mode="append")
    log = DeltaLog(p)
    log.write_checkpoint()
    # a quarantined checksum travels with its commit too
    with open(log._crc_path(1) + ".quarantined", "w") as fh:
        fh.write("{}")
    old = time.time() - 3600
    for v in range(3):
        os.utime(log.commit_file_path(v), (old, old))
    deleted = log.cleanup_expired_logs()
    for v in range(3):
        assert not os.path.exists(log._crc_path(v))
        assert log.commit_file_path(v) in deleted
    assert not os.path.exists(log._crc_path(1) + ".quarantined")
    # newest state still reads
    assert DeltaTable.forPath(spark, p).toDF().count() == 6
