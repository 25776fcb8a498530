"""DML-vs-DML race resolution at the OPERATOR level (VERDICT r8 item
4): two full MERGEs computed against the same snapshot — the loser of
the version race re-checks the winner's actions (delta ConflictChecker
parity, log._actions_conflict) and either retries at the next slot
(file-disjoint) or aborts (overlapping rewrite).

The interleaving is staged deterministically: DeltaLog.commit is
wrapped so that the FIRST merge's commit runs a competing merge to
completion just before attempting its own version — exactly the
read-snapshot → concurrent-winner → commit ordering a real cluster
race produces, without timing flakiness.
"""

import os

import pytest

from jodie_spark.errors import (
    ConcurrentAppendException,
    ConcurrentModificationException,
)
from jodie_spark.tables.log import DeltaLog
from jodie_spark.tables.table import DeltaTable, write_delta


@pytest.fixture()
def partitioned_table(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "dml_race")
    df = spark.range(10).selectExpr("id", "id % 2 as part", "0 as v")
    write_delta(df.repartition("part"), p, partition_by=["part"])
    return p


def _merge_updating(spark, path, ids, new_v, part=None):
    """MERGE that sets v=new_v for the given ids. ``part`` adds the
    partition-qualifying conjunct delta's docs prescribe for concurrent
    merges — it confines both the file scan AND the recorded read set."""
    t = DeltaTable.forPath(spark, path)
    src = spark.createDataFrame([(i, new_v) for i in ids], "id long, nv int")
    cond = "t.id = s.id" + (f" AND t.part = {part}" if part is not None else "")
    (
        t.alias("t")
        .merge(src.alias("s"), cond)
        .whenMatchedUpdate(set={"v": "s.nv"})
        .execute()
    )


def _stage_race(monkeypatch, spark, path, winner_fn):
    """Make the NEXT DeltaLog.commit for `path` lose the version race:
    just before it attempts its version, run winner_fn() to completion
    through an unpatched commit."""
    original = DeltaLog.commit
    state = {"armed": True}

    def racing_commit(self, read_version, actions, operation, *a, **kw):
        if state["armed"] and operation == "MERGE" and self.table_path.endswith(
            os.path.basename(path)
        ):
            state["armed"] = False  # the winner commits un-intercepted
            winner_fn()
        return original(self, read_version, actions, operation, *a, **kw)

    monkeypatch.setattr(DeltaLog, "commit", racing_commit)


def test_merge_race_disjoint_partitions_both_commit(
    spark, partitioned_table, monkeypatch
):
    """Two merges with PARTITION-QUALIFIED conditions on different
    partitions: each records a read set confined to its partition, the
    loser finds no file overlap and no stale read, and commits at the
    next version — no user-level retry, both updates land (the delta
    docs' prescribed pattern for concurrent merges)."""
    p = partitioned_table
    _stage_race(
        monkeypatch, spark, p,
        lambda: _merge_updating(spark, p, ids=[1, 3], new_v=222, part=1),
    )
    _merge_updating(spark, p, ids=[0, 2], new_v=111, part=0)  # loses race

    t = DeltaTable.forPath(spark, p)
    got = {r["id"]: r["v"] for r in t.toDF().collect()}
    assert got[0] == 111 and got[2] == 111  # loser's update landed
    assert got[1] == 222 and got[3] == 222  # winner's update landed
    assert got[4] == 0 and got[5] == 0  # untouched rows intact
    ops = [r["operation"] for r in t.history().collect()]
    assert ops.count("MERGE") == 2  # both committed, two versions


def test_merge_race_unqualified_condition_raises_concurrent_append(
    spark, partitioned_table, monkeypatch
):
    """The same disjoint-key race WITHOUT partition conjuncts: the
    loser's merge condition (t.id = s.id) confines nothing, so its
    recorded read set is the whole table — the winner's rewritten file
    is one the loser's scan would have read, and the result it staged
    is stale. delta-core raises ConcurrentAppendException here (its
    docs tell users to add the partition predicate, which is exactly
    the test above); so do we."""
    p = partitioned_table
    _stage_race(
        monkeypatch, spark, p,
        lambda: _merge_updating(spark, p, ids=[1, 3], new_v=222),  # part=1 file
    )
    with pytest.raises(ConcurrentAppendException, match="would have read"):
        _merge_updating(spark, p, ids=[0, 2], new_v=111)  # whole-table read

    t = DeltaTable.forPath(spark, p)
    got = {r["id"]: r["v"] for r in t.toDF().collect()}
    assert got[1] == 222 and got[3] == 222  # winner survived
    assert got[0] == 0 and got[2] == 0  # loser rolled back cleanly
    ops = [r["operation"] for r in t.history().collect()]
    assert ops.count("MERGE") == 1  # exactly one committed


def test_merge_race_overlapping_file_one_aborts(
    spark, partitioned_table, monkeypatch
):
    """Two merges rewriting the SAME partition's file: the loser's
    remove targets a file the winner already rewrote — a real conflict,
    ConcurrentModificationException, and the winner's result survives
    unscathed (never a lost update or a double rewrite)."""
    p = partitioned_table
    _stage_race(
        monkeypatch, spark, p,
        lambda: _merge_updating(spark, p, ids=[2], new_v=222),  # part=0
    )
    with pytest.raises(ConcurrentModificationException, match="removed by both"):
        _merge_updating(spark, p, ids=[0], new_v=111)  # part=0 too

    t = DeltaTable.forPath(spark, p)
    got = {r["id"]: r["v"] for r in t.toDF().collect()}
    assert got[2] == 222  # winner survived
    assert got[0] == 0  # loser rolled back cleanly
    ops = [r["operation"] for r in t.history().collect()]
    assert ops.count("MERGE") == 1  # exactly one committed
