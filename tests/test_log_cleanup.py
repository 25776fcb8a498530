"""Metadata cleanup: delta.logRetentionDuration expiry below the newest
checkpoint, checkpointProtection boundary, interval parsing."""

import os
import time

import pytest

from jodie_spark.errors import VersionNotFoundError
from jodie_spark.tables.log import DeltaLog, parse_interval_ms
from jodie_spark.tables.table import DeltaTable, write_delta


def test_parse_interval_ms():
    assert parse_interval_ms("interval 30 days", 7) == 30 * 86_400_000
    assert parse_interval_ms("interval 2 hours", 7) == 7_200_000
    assert parse_interval_ms("INTERVAL 1 WEEK", 7) == 7 * 86_400_000
    assert parse_interval_ms("5 minutes", 7) == 300_000
    assert parse_interval_ms(None, 7) == 7
    assert parse_interval_ms("garbage", 7) == 7


def _age(path: str, seconds: float = 3600) -> None:
    old = time.time() - seconds
    os.utime(path, (old, old))


def test_cleanup_deletes_expired_below_checkpoint(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "t")
    write_delta(
        spark.range(3).selectExpr("id"),
        p,
        options={"delta.logRetentionDuration": "interval 30 minutes"},
    )
    for i in range(3):
        write_delta(spark.range(i, i + 1).selectExpr("id"), p, mode="append")
    log = DeltaLog(p)
    log.write_checkpoint()  # checkpoint at version 3
    # nothing is old enough yet → cleanup is a no-op
    assert log.cleanup_expired_logs() == []
    # age versions 0-2 past retention
    for v in range(3):
        _age(log.commit_file_path(v))
    deleted = log.cleanup_expired_logs()
    # 3 commit JSONs + their version checksums (round 5: .crc travels
    # with its commit)
    assert len([d for d in deleted if d.endswith(".json")]) == 3
    assert len([d for d in deleted if d.endswith(".crc")]) == 3
    assert log.list_commit_versions() == [3]
    # latest state still reads fine (checkpoint + tail)
    t = DeltaTable.forPath(spark, p)
    assert t.toDF().count() == 6
    # time travel to a cleaned version now raises — delta parity
    with pytest.raises(VersionNotFoundError):
        t.snapshot(0)


def test_cleanup_keeps_everything_without_checkpoint(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "t")
    write_delta(
        spark.range(2).selectExpr("id"),
        p,
        options={"delta.logRetentionDuration": "interval 1 minute"},
    )
    write_delta(spark.range(2).selectExpr("id"), p, mode="append")
    log = DeltaLog(p)
    for v in (0, 1):
        _age(log.commit_file_path(v))
    assert log.cleanup_expired_logs() == []  # no checkpoint → keep all


def test_cleanup_removes_old_checkpoints_too(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "t")
    write_delta(
        spark.range(2).selectExpr("id"),
        p,
        options={"delta.logRetentionDuration": "interval 10 minutes"},
    )
    log = DeltaLog(p)
    log.write_checkpoint()  # at v0
    write_delta(spark.range(2).selectExpr("id"), p, mode="append")
    log.write_checkpoint()  # at v1
    assert len(log.list_checkpoint_versions()) == 2
    _age(log.commit_file_path(0))
    for part in log.checkpoint_part_files(0):
        _age(part)
    deleted = log.cleanup_expired_logs()
    assert any(".checkpoint." in d for d in deleted)
    assert log.list_checkpoint_versions() == [1]
    assert DeltaTable.forPath(spark, p).toDF().count() == 4


def test_checkpoint_protection_blocks_early_cleanup(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "t")
    write_delta(
        spark.range(2).selectExpr("id"),
        p,
        options={
            "delta.logRetentionDuration": "interval 1 minute",
            "delta.requireCheckpointProtectionBeforeVersion": "5",
        },
    )
    for i in range(3):
        write_delta(spark.range(1).selectExpr("id"), p, mode="append")
    log = DeltaLog(p)
    log.write_checkpoint()  # at v3 < protection boundary 5
    for v in range(3):
        _age(log.commit_file_path(v))
    assert log.cleanup_expired_logs() == []  # boundary not yet covered
    for i in range(2):
        write_delta(spark.range(1).selectExpr("id"), p, mode="append")
    log.write_checkpoint()  # at v5 >= boundary
    for v in range(5):
        _age(log.commit_file_path(v))
    deleted = log.cleanup_expired_logs()
    assert len(deleted) >= 5
    assert DeltaTable.forPath(spark, p).toDF().count() == 7


def test_domain_metadata_survives_two_checkpoints(spark, tmpdir_path):
    """Snapshot replay must read domainMetadata out of checkpoints.
    Before r12 it skipped the column, so a domain persisted only in a
    checkpoint vanished from snapshot().domain_metadata — and because
    the driver-side write_checkpoint serializes exactly that dict, a
    SECOND checkpoint dropped the domain permanently (e.g. a
    row-tracking watermark, after log cleanup)."""
    p = os.path.join(tmpdir_path, "dm")
    write_delta(spark.createDataFrame([(1, "a")], ["k", "v"]), p)
    log = DeltaLog(p)
    dm = {"domain": "app.watermark", "configuration": '{"hi":1}', "removed": False}
    log.commit(log.latest_version(), [{"domainMetadata": dm}], "SET DOMAIN", {})
    removed = {"domain": "app.gone", "configuration": "{}", "removed": False}
    log.commit(log.latest_version(), [{"domainMetadata": removed}], "SET DOMAIN", {})
    log.commit(
        log.latest_version(),
        [{"domainMetadata": {**removed, "removed": True}}],
        "DROP DOMAIN",
        {},
    )
    log.write_checkpoint()
    write_delta(spark.createDataFrame([(2, "b")], ["k", "v"]), p, mode="append")
    snap = log.snapshot()
    assert "app.watermark" in snap.domain_metadata  # read from checkpoint
    assert "app.gone" not in snap.domain_metadata  # removal honored
    assert snap.domain_metadata["app.watermark"]["configuration"] == '{"hi":1}'
    # second checkpoint must still carry the domain
    cp2 = log.write_checkpoint()
    write_delta(spark.createDataFrame([(3, "c")], ["k", "v"]), p, mode="append")
    snap2 = log.snapshot()
    assert snap2.domain_metadata.get("app.watermark", {}).get("configuration") == '{"hi":1}'
    assert log.all_domain_metadata().keys() == {"app.watermark"}
