"""Ports of reference DeltaHelperSpec dedup/append tests — including
the semantic quirks (kill removes ALL copies; pk variant keeps min-pk;
no-pk variant keeps one occurrence via overwrite)."""

import os

import pytest

from jodie_spark.operators import (
    append_without_duplicates,
    kill_duplicate_records,
    remove_duplicate_records,
)
from jodie_spark.tables.table import DeltaTable, write_delta


def _table(spark, tmpdir_path, rows, cols, name="t"):
    path = os.path.join(tmpdir_path, name)
    write_delta(spark.createDataFrame(rows, cols), path)
    return DeltaTable.forPath(spark, path)


def test_kill_duplicates_removes_every_copy(spark, tmpdir_path):
    # parity: DeltaHelperSpec.scala:95-108 — no survivor from a dup group
    t = _table(
        spark,
        tmpdir_path,
        [(1, "Benito", "Jackson"), (2, "Maria", "Willis"), (3, "Benito", "Jackson"),
         (4, "Jose", "Travolta"), (5, "Benito", "Jackson"), (6, "Jose", "Travolta")],
        ["id", "firstname", "lastname"],
    )
    kill_duplicate_records(t, ["firstname", "lastname"])
    assert sorted(r["id"] for r in t.toDF().collect()) == [2]


def test_kill_duplicates_empty_columns_raises(spark, tmpdir_path):
    t = _table(spark, tmpdir_path, [(1, "a", "b")], ["id", "firstname", "lastname"])
    with pytest.raises(ValueError):
        kill_duplicate_records(t, [])


def test_remove_duplicates_pk_keeps_lowest_pk(spark, tmpdir_path):
    # parity: DeltaHelperSpec.scala:160-230 (row_number ordered by pk)
    t = _table(
        spark,
        tmpdir_path,
        [(3, "Benito", "Jackson"), (1, "Benito", "Jackson"), (2, "Maria", "Willis"),
         (5, "Jose", "Travolta"), (4, "Jose", "Travolta")],
        ["id", "firstname", "lastname"],
    )
    remove_duplicate_records(t, ["firstname", "lastname"], primary_key="id")
    assert sorted(r["id"] for r in t.toDF().collect()) == [1, 2, 4]


def test_remove_duplicates_pk_tied_minimum_deletes_whole_group(spark, tmpdir_path):
    """Reference quirk on NON-UNIQUE primary keys: row_number orders by
    pk, so one of the tied-minimum rows lands at rn=2, and the merge's
    (pk, dup_cols) equality then deletes every row of that combination —
    the whole duplicate group disappears (DeltaHelpers.scala:302-317).
    Groups whose minimum is unique keep exactly the min-pk row."""
    t = _table(
        spark,
        tmpdir_path,
        # group Benito/Jackson: min pk 1 is TIED → all of ids 1,1,3 go;
        # group Jose/Travolta: min pk 4 unique → 4 stays, 5 goes;
        # Maria/Willis not duplicated → untouched
        [(1, "Benito", "Jackson"), (1, "Benito", "Jackson"), (3, "Benito", "Jackson"),
         (2, "Maria", "Willis"), (5, "Jose", "Travolta"), (4, "Jose", "Travolta")],
        ["id", "firstname", "lastname"],
    )
    remove_duplicate_records(t, ["firstname", "lastname"], primary_key="id")
    assert sorted(r["id"] for r in t.toDF().collect()) == [2, 4]


def test_remove_duplicates_pk_null_pk_sorts_first(spark, tmpdir_path):
    """Reference quirk on NULL primary keys: ascending row_number puts
    NULL first (rn=1), pushing every non-NULL-pk row of the group into
    the delete set — while the NULL-pk rows themselves survive because
    the merge's pk-equality can never match a NULL."""
    t = _table(
        spark,
        tmpdir_path,
        [(None, "Benito", "Jackson"), (2, "Benito", "Jackson"), (3, "Benito", "Jackson"),
         (1, "Maria", "Willis")],
        ["id", "firstname", "lastname"],
    )
    remove_duplicate_records(t, ["firstname", "lastname"], primary_key="id")
    assert sorted(
        (r["id"] is None, r["id"]) for r in t.toDF().collect()
    ) == [(False, 1), (True, None)]


def test_remove_duplicates_nopk_keeps_one(spark, tmpdir_path):
    # parity: DeltaHelpers.scala:321-340 (dropDuplicates + overwrite)
    t = _table(
        spark,
        tmpdir_path,
        [("Benito", "Jackson"), ("Benito", "Jackson"), ("Maria", "Willis")],
        ["firstname", "lastname"],
    )
    remove_duplicate_records(t, ["firstname", "lastname"])
    got = sorted(tuple(r) for r in t.toDF().collect())
    assert got == [("Benito", "Jackson"), ("Maria", "Willis")]
    # implemented as overwrite, not merge — a second version exists
    assert t.deltaLog.latest_version() == 1


def test_append_without_duplicates(spark, tmpdir_path):
    # parity: DeltaHelperSpec.scala:580-677 — incoming batch pre-deduped,
    # existing keys skipped
    t = _table(
        spark, tmpdir_path, [(1, "a"), (2, "b")], ["id", "v"], name="app"
    )
    appends = spark.createDataFrame(
        [(2, "CHANGED"), (3, "c"), (3, "c"), (4, "d")], ["id", "v"]
    )
    append_without_duplicates(t, appends, ["id"])
    got = sorted((r["id"], r["v"]) for r in t.toDF().collect())
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


def test_append_without_duplicates_empty_key_raises(spark, tmpdir_path):
    t = _table(spark, tmpdir_path, [(1, "a")], ["id", "v"])
    with pytest.raises(ValueError):
        append_without_duplicates(t, t.toDF(), [])


def test_insert_only_merge_never_rewrites_files(spark, tmpdir_path):
    """Round-7 optimization (delta-spark optimizeInsertOnlyMerge): a
    merge with only not-matched clauses appends new files and removes
    NOTHING — matched target files stay byte-identical on disk, the
    commit carries zero remove actions, and the metrics record
    copied=0/removed=0. Clause-order + conditional not-matched clauses
    still resolve; matched source rows do not insert."""
    import json
    import os

    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "insonly")
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), p
    )
    t = DeltaTable.forPath(spark, p)
    files_before = {
        a["path"]: a["size"] for a in t.snapshot().add_files()
    }
    src = spark.createDataFrame(
        [(1, "SKIP-matched"), (3, "c"), (4, "d"), (5, "drop-me")],
        "k int, v string",
    )
    (
        t.alias("t")
        .merge(src.alias("s"), "t.k = s.k")
        .whenNotMatchedInsert(condition="s.k < 5", values={"k": "s.k", "v": "s.v"})
        .execute()
    )
    t2 = DeltaTable.forPath(spark, p)
    got = {r["k"]: r["v"] for r in t2.toDF().collect()}
    assert got == {1: "a", 2: "b", 3: "c", 4: "d"}  # 1 not re-inserted, 5 filtered
    # original files survive untouched; commit has adds only
    after = {a["path"]: a["size"] for a in t2.snapshot().add_files()}
    assert set(files_before) <= set(after)
    v = t2.deltaLog.latest_version()
    actions = t2.deltaLog.read_actions(v)
    assert not any("remove" in a for a in actions)
    assert any("add" in a for a in actions)
    hist = {r["version"]: r for r in t2.history().collect()}
    m = hist[v]["operationMetrics"]
    assert m["numTargetRowsInserted"] == "2"
    assert m["numTargetRowsCopied"] == "0"
    assert m["numTargetFilesRemoved"] == "0"
    assert m["numSourceRows"] == "4"
    # all-matched batch: a no-op commit with zero adds is still clean
    (
        t2.alias("t")
        .merge(
            spark.createDataFrame([(1, "x")], "k int, v string").alias("s"),
            "t.k = s.k",
        )
        .whenNotMatchedInsertAll()
        .execute()
    )
    assert DeltaTable.forPath(spark, p).toDF().count() == 4
    # a TARGET-referencing not-matched condition falls back to the slow
    # path and still answers correctly
    (
        t2.alias("tt")
        .merge(
            spark.createDataFrame([(9, "i")], "k int, v string").alias("s"),
            "tt.k = s.k",
        )
        .whenNotMatchedInsert(condition="tt.k IS NULL", values={"k": "s.k", "v": "s.v"})
        .execute()
    )
    assert {r["k"] for r in DeltaTable.forPath(spark, p).toDF().collect()} == {1, 2, 3, 4, 9}
