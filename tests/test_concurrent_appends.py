"""Read-set conflict checking (delta-core ConflictChecker parity,
round-10): a DML transaction records WHICH FILES ITS SCAN COULD HAVE
READ (pruning.make_read_checker over its planning condition); when it
loses the version race, a winning commit that ADDED matching data files
means the staged result is stale → ConcurrentAppendException.

Isolation semantics pinned here (delta IsolationLevel.scala):
- WriteSerializable (default): winning BLIND APPENDS (adds only, table
  never read — commitInfo.isBlindAppend=true) are exempt; non-blind
  adds (merge inserts, update rewrites) conflict when they land in the
  loser's read set.
- delta.isolationLevel=Serializable: blind appends conflict too.

The interleaving is staged deterministically, same technique as
test_concurrent_dml.py: DeltaLog.commit is wrapped so the loser's
commit runs the winner to completion just before attempting its own
version.
"""

import json
import os

import pytest

from jodie_spark.errors import (
    ConcurrentAppendException,
    ConcurrentDeleteReadException,
)
from jodie_spark.operators.dedup import append_without_duplicates
from jodie_spark.tables.log import DeltaLog
from jodie_spark.tables.table import DeltaTable, write_delta


@pytest.fixture()
def partitioned_table(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "append_race")
    df = spark.range(10).selectExpr("id", "id % 2 as part", "0 as v")
    write_delta(df.repartition("part"), p, partition_by=["part"])
    return p


def _stage_race(monkeypatch, path, operation, winner_fn):
    """Make the NEXT DeltaLog.commit of `operation` for `path` lose the
    version race: run winner_fn() to completion (through an unpatched
    commit) just before it attempts its version."""
    original = DeltaLog.commit
    state = {"armed": True}

    def racing_commit(self, read_version, actions, op, *a, **kw):
        if (
            state["armed"]
            and op == operation
            and self.table_path.endswith(os.path.basename(path))
        ):
            state["armed"] = False
            winner_fn()
        return original(self, read_version, actions, op, *a, **kw)

    monkeypatch.setattr(DeltaLog, "commit", racing_commit)


def _blind_append(spark, path, rows):
    """rows = [(id, part, v)] appended without reading the table."""
    df = spark.createDataFrame(rows, "id long, part bigint, v int")
    write_delta(df, path, mode="append")


def _nonblind_insert(spark, path, rows):
    """Insert-only MERGE: reads the table (anti-join) before appending,
    so its commit is stamped isBlindAppend=false."""
    t = DeltaTable.forPath(spark, path)
    df = spark.createDataFrame(rows, "id long, part bigint, v int")
    append_without_duplicates(t, df, ["id"])


def _commit_info(path, version):
    log = DeltaLog(path)
    for a in log.read_actions(version):
        if a.get("commitInfo"):
            return a["commitInfo"]
    return {}


def test_is_blind_append_stamping(spark, partitioned_table):
    """Appends that never read the table are stamped blind; DML and
    table-reading merges are not."""
    p = partitioned_table
    _blind_append(spark, p, [(100, 0, 7)])
    t = DeltaTable.forPath(spark, p)
    v_append = t.deltaLog.latest_version()
    assert _commit_info(p, v_append)["isBlindAppend"] is True

    _nonblind_insert(spark, p, [(101, 0, 7)])
    assert _commit_info(p, t.deltaLog.latest_version())["isBlindAppend"] is False

    t.delete("part = 0 AND id >= 100")
    assert _commit_info(p, t.deltaLog.latest_version())["isBlindAppend"] is False


def test_delete_vs_blind_append_write_serializable_both_commit(
    spark, partitioned_table, monkeypatch
):
    """Default isolation: a blind append into the partition a DELETE is
    scanning does NOT conflict — the append read nothing, so ordering
    it after the delete is serializable by writes. The appended rows
    survive the delete (they were not in its snapshot)."""
    p = partitioned_table
    _stage_race(
        monkeypatch, p, "DELETE",
        lambda: _blind_append(spark, p, [(100, 0, 7)]),
    )
    DeltaTable.forPath(spark, p).delete("part = 0")

    t = DeltaTable.forPath(spark, p)
    got = {r["id"] for r in t.toDF().collect()}
    assert 100 in got  # the concurrently appended row survived
    assert got & {0, 2, 4, 6, 8} == set()  # snapshot part=0 rows deleted
    assert {1, 3, 5, 7, 9} <= got  # part=1 untouched
    ops = [r["operation"] for r in t.history().collect()]
    assert ops.count("DELETE") == 1 and ops.count("WRITE") >= 1


def test_delete_vs_nonblind_insert_same_partition_raises(
    spark, partitioned_table, monkeypatch
):
    """A NON-blind winner (insert-only merge: it anti-joined the table
    before appending) adding files into the partition the DELETE read →
    the delete's staged rewrite is stale → ConcurrentAppendException,
    and the winner's rows survive unscathed."""
    p = partitioned_table
    _stage_race(
        monkeypatch, p, "DELETE",
        lambda: _nonblind_insert(spark, p, [(100, 0, 7)]),
    )
    with pytest.raises(ConcurrentAppendException, match="would have read"):
        DeltaTable.forPath(spark, p).delete("part = 0")

    t = DeltaTable.forPath(spark, p)
    got = {r["id"] for r in t.toDF().collect()}
    assert got == set(range(10)) | {100}  # delete rolled back, insert landed
    ops = [r["operation"] for r in t.history().collect()]
    assert ops.count("DELETE") == 0


def test_delete_vs_nonblind_insert_other_partition_ok(
    spark, partitioned_table, monkeypatch
):
    """The same non-blind winner, but its adds land in a partition the
    DELETE's predicate excludes — the read checker proves the delete
    never scanned them, so both commit."""
    p = partitioned_table
    _stage_race(
        monkeypatch, p, "DELETE",
        lambda: _nonblind_insert(spark, p, [(101, 1, 7)]),
    )
    DeltaTable.forPath(spark, p).delete("part = 0")

    t = DeltaTable.forPath(spark, p)
    got = {r["id"] for r in t.toDF().collect()}
    assert got == {1, 3, 5, 7, 9, 101}
    ops = [r["operation"] for r in t.history().collect()]
    assert ops.count("DELETE") == 1 and ops.count("MERGE") == 1


def test_serializable_isolation_conflicts_on_blind_appends(
    spark, partitioned_table, monkeypatch
):
    """delta.isolationLevel=Serializable withdraws the blind-append
    exemption: the same race that commits cleanly under the default
    isolation now raises ConcurrentAppendException."""
    from jodie_spark.sql import sql

    p = partitioned_table
    sql(
        spark,
        f"ALTER TABLE delta.`{p}` SET TBLPROPERTIES "
        "('delta.isolationLevel' = 'Serializable')",
    )
    _stage_race(
        monkeypatch, p, "DELETE",
        lambda: _blind_append(spark, p, [(100, 0, 7)]),
    )
    with pytest.raises(ConcurrentAppendException, match="would have read"):
        DeltaTable.forPath(spark, p).delete("part = 0")

    t = DeltaTable.forPath(spark, p)
    got = {r["id"] for r in t.toDF().collect()}
    assert got == set(range(10)) | {100}  # delete rolled back, append landed


def test_dv_delete_and_update_record_read_sets(
    spark, partitioned_table, monkeypatch
):
    """The merge-on-read (deletion-vector) DELETE and the UPDATE paths
    record read sets too: each loses to a non-blind insert in its
    scanned partition and raises."""
    p = partitioned_table
    _stage_race(
        monkeypatch, p, "DELETE",
        lambda: _nonblind_insert(spark, p, [(100, 0, 7)]),
    )
    with pytest.raises(ConcurrentAppendException, match="would have read"):
        DeltaTable.forPath(spark, p).delete("part = 0", deletion_vectors=True)

    _stage_race(
        monkeypatch, p, "UPDATE",
        lambda: _nonblind_insert(spark, p, [(102, 0, 7)]),
    )
    with pytest.raises(ConcurrentAppendException, match="would have read"):
        DeltaTable.forPath(spark, p).update("part = 0", {"v": "9"})


def test_optimize_adds_do_not_conflict(spark, partitioned_table, monkeypatch):
    """A winning OPTIMIZE rewrites files with dataChange=false — no new
    data — so a concurrent DELETE of a DIFFERENT partition commits
    through it (delta parity: compaction never invalidates reads)."""
    p = partitioned_table
    # make part=1 compactable: a second small file
    _blind_append(spark, p, [(11, 1, 0)])
    _stage_race(
        monkeypatch, p, "DELETE",
        lambda: DeltaTable.forPath(spark, p)
        .optimize()
        .where("part = 1")
        .executeCompaction(),
    )
    DeltaTable.forPath(spark, p).delete("part = 0")

    t = DeltaTable.forPath(spark, p)
    got = {r["id"] for r in t.toDF().collect()}
    assert got == {1, 3, 5, 7, 9, 11}
    ops = [r["operation"] for r in t.history().collect()]
    assert ops.count("DELETE") == 1 and ops.count("OPTIMIZE") == 1


def test_reading_merge_vs_concurrent_delete_raises(
    spark, partitioned_table, monkeypatch
):
    """A winner that REMOVED files the loser read is as stale-making as
    one that added them: append_without_duplicates anti-joined the
    whole table, so a concurrent DELETE of any partition invalidates
    its suppression decisions → ConcurrentDeleteReadException (delta's
    checkForDeletedFilesAgainstCurrentTxnReadFiles)."""
    p = partitioned_table
    _stage_race(
        monkeypatch, p, "MERGE",
        lambda: DeltaTable.forPath(spark, p).delete("part = 0"),
    )
    with pytest.raises(ConcurrentDeleteReadException, match="scan read"):
        _nonblind_insert(spark, p, [(0, 0, 7)])  # id 0 was just deleted

    t = DeltaTable.forPath(spark, p)
    got = {r["id"] for r in t.toDF().collect()}
    assert got == {1, 3, 5, 7, 9}  # delete landed, merge rolled back


def test_disjoint_deletes_both_commit(spark, partitioned_table, monkeypatch):
    """Two DELETEs on different partitions: each read set excludes the
    other's removes, so the loser retries cleanly and both land."""
    p = partitioned_table
    _stage_race(
        monkeypatch, p, "DELETE",
        lambda: DeltaTable.forPath(spark, p).delete("part = 1"),
    )
    DeltaTable.forPath(spark, p).delete("part = 0")

    t = DeltaTable.forPath(spark, p)
    assert t.toDF().count() == 0
    ops = [r["operation"] for r in t.history().collect()]
    assert ops.count("DELETE") == 2


def test_read_check_serialization_shape(spark, partitioned_table):
    """The stamped commitInfo key survives a JSON round-trip of the log
    (it must be readable by foreign engines checking blind-append
    exemptions)."""
    p = partitioned_table
    _blind_append(spark, p, [(100, 0, 7)])
    log = DeltaLog(p)
    v = log.latest_version()
    raw = open(os.path.join(p, "_delta_log", f"{v:020d}.json")).readline()
    assert json.loads(raw)["commitInfo"]["isBlindAppend"] is True


def test_generated_derivation_sharpens_read_set(spark, tmpdir_path, monkeypatch):
    """The read-set conflict checker sees the DERIVED partition
    conjuncts: a DELETE whose only predicate is on the base timestamp
    column records a day-confined read set, so a concurrent non-blind
    insert into a DIFFERENT day co-commits — and one into the SAME day
    conflicts."""
    p = os.path.join(tmpdir_path, "gen_race")
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"2024-01-{1 + i % 2:02d} 06:00:00") for i in range(8)], ["id", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    write_delta(
        df.repartition("ts"), p,
        partition_by=["day"], generated_columns={"day": "cast(ts as date)"},
    )

    def insert_day(day_i, ids):
        t = DeltaTable.forPath(spark, p)
        src = (
            spark.createDataFrame(
                [(i, f"2024-01-{day_i:02d} 09:00:00") for i in ids], ["id", "ts"]
            )
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withColumn("day", F.col("ts").cast("date"))
        )
        append_without_duplicates(t, src, ["id"])

    # other-day insert: the derived `day` bounds exclude it → co-commit
    _stage_race(monkeypatch, p, "DELETE", lambda: insert_day(2, [100]))
    DeltaTable.forPath(spark, p).delete(
        "ts >= '2024-01-01 00:00:00' AND ts < '2024-01-02 00:00:00'"
    )
    t = DeltaTable.forPath(spark, p)
    got = {r["id"] for r in t.toDF().collect()}
    assert got == {i for i in range(8) if i % 2 == 1} | {100}

    # same-day insert: inside the derived read set → conflict
    _stage_race(monkeypatch, p, "DELETE", lambda: insert_day(2, [200]))
    with pytest.raises(ConcurrentAppendException, match="would have read"):
        DeltaTable.forPath(spark, p).delete(
            "ts >= '2024-01-02 00:00:00' AND ts < '2024-01-03 00:00:00'"
        )
