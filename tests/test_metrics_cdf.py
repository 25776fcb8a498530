"""OperationMetricHelper + ChangeDataFeedHelper scenario tests
(ports of OperationMetricHelperSpec / ChangeDataFeedHelperSpec shapes)."""

import os

import pytest

from jodie_spark.operators.cdf import ChangeDataFeedHelper, read_cdf
from jodie_spark.operators.metrics import (
    OperationMetricHelper,
    split_condition,
    validate_partition_condition,
)
from jodie_spark.tables.table import DeltaTable, write_delta


def _mk(spark, tmpdir_path, name="t", **kw):
    path = os.path.join(tmpdir_path, name)
    rows = [(i, "m" if i % 2 == 0 else "f", 20 + i) for i in range(10)]
    write_delta(spark.createDataFrame(rows, "id int, gender string, age int"), path, **kw)
    return path, DeltaTable.forPath(spark, path)


def test_count_metrics_sequence(spark, tmpdir_path):
    path, t = _mk(spark, tmpdir_path)
    t.delete("gender = 'f'")       # 5 deleted
    t.update("id = 0", {"age": "age + 1"})  # 1 updated
    rows = OperationMetricHelper(spark, path).get_count_metrics()
    assert rows == [(2, 0, 0, 1, 0), (1, 5, 0, 0, 0), (0, 0, 10, 0, 10)]


def test_count_metrics_merge(spark, tmpdir_path):
    path, t = _mk(spark, tmpdir_path, name="mg")
    src = spark.createDataFrame([(0, "m", 99), (100, "f", 50)], "id int, gender string, age int")
    (
        t.alias("old").merge(src.alias("new"), "old.id = new.id")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    rows = OperationMetricHelper(spark, path).get_count_metrics()
    assert rows[0] == (1, 0, 1, 1, 2)  # version 1: 1 inserted, 1 updated, 2 source


def test_count_metrics_version_bounds(spark, tmpdir_path):
    path, t = _mk(spark, tmpdir_path, name="vb")
    t.delete("gender = 'f'")
    t.update("id = 0", {"age": "age + 1"})
    rows = OperationMetricHelper(spark, path, starting_version=1, ending_version=1).get_count_metrics()
    assert rows == [(1, 5, 0, 0, 0)]


def test_optimize_version_excluded_from_metrics(spark, tmpdir_path):
    # parity: OperationMetricHelperSpec.scala:159 — compaction commits
    # are not count-metric operations
    path, t = _mk(spark, tmpdir_path, name="optm")
    t.delete("gender = 'f'")
    t.optimize().executeCompaction()
    rows = OperationMetricHelper(spark, path).get_count_metrics()
    assert [r[0] for r in rows] == [1, 0]  # versions: delete, write — no OPTIMIZE row


def test_merge_included_by_partition_filter(spark, tmpdir_path):
    # a merge whose condition names the partition value must appear in
    # partition-filtered metrics (predicate-normalization path for MERGE)
    path = os.path.join(tmpdir_path, "mgp")
    rows = [(i, "us" if i < 6 else "eu", 20 + i) for i in range(10)]
    write_delta(
        spark.createDataFrame(rows, "id int, country string, age int"),
        path,
        partition_by=["country"],
    )
    t = DeltaTable.forPath(spark, path)
    src = spark.createDataFrame([(1, "us", 99)], "id int, country string, age int")
    (
        t.alias("snap")
        .merge(src.alias("source"), "snap.id = source.id and snap.country = 'us'")
        .whenMatchedUpdateAll()
        .execute()
    )
    got = OperationMetricHelper(spark, path).get_count_metrics("country = 'us'")
    assert got[0] == (1, 0, 0, 1, 1)  # the merge row survives the filter
    got_eu = OperationMetricHelper(spark, path).get_count_metrics("country = 'eu'")
    assert got_eu[0][0] == 0  # only the WRITE row (merge filtered out)


def test_partition_predicate_normalization():
    # parity: OperationMetricHelper.scala:129-176 — the three recorded
    # predicate spellings
    assert split_condition("country = 'USA' and gender = 'Female'") == {
        "country": "USA", "gender": "Female",
    }
    assert split_condition("country#590 = USA") == {"country": "USA"}
    assert split_condition("snap.country = 'IND'") == {"country": "IND"}
    rec = '["(((country = \'USA\') AND (gender = \'Female\')) AND (id = 2))"]'
    assert validate_partition_condition(rec, "country = 'USA'")
    assert validate_partition_condition(rec, "country = 'USA' and gender = 'Female'")
    assert not validate_partition_condition(rec, "country = 'IND'")


def test_write_metric_by_partition(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "pw")
    rows = [(i, "us" if i < 7 else "eu") for i in range(10)]
    write_delta(
        spark.createDataFrame(rows, "id int, country string"), path, partition_by=["country"]
    )
    helper = OperationMetricHelper(spark, path)
    assert helper.get_write_metric_by_partition("country = 'us'", 0) == 7
    got = helper.get_count_metrics("country = 'eu'")
    assert got == [(0, 0, 3, 0, 3)]


def _cdf_table(spark, tmpdir_path, name="cdf"):
    path = os.path.join(tmpdir_path, name)
    rows = [(1, "m", 25), (2, "m", 25), (3, "f", 35)]
    write_delta(
        spark.createDataFrame(rows, "id int, gender string, age int"),
        path,
        options={"delta.enableChangeDataFeed": "true"},
    )
    return path, DeltaTable.forPath(spark, path)


def test_read_cdf_changes(spark, tmpdir_path):
    path, t = _cdf_table(spark, tmpdir_path)
    t.delete("id = 1")
    t.update("id = 2", {"age": "100"})
    df = read_cdf(spark, path, 1, 2)
    got = sorted((r["id"], r["_change_type"], r["_commit_version"]) for r in df.collect())
    assert got == [
        (1, "delete", 1),
        (2, "update_postimage", 2),
        (2, "update_preimage", 2),
    ]


def test_read_cdf_merge_changes(spark, tmpdir_path):
    # merges must record change rows when CDF is on — the reference's
    # CDF fixtures are built from merge loops
    path, t = _cdf_table(spark, tmpdir_path, name="mcdf")
    src = spark.createDataFrame(
        [(1, "m", 99), (9, "f", 40)], "id int, gender string, age int"
    )
    (
        t.alias("old").merge(src.alias("new"), "old.id = new.id")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    df = read_cdf(spark, path, 1, 1)
    got = sorted((r["id"], r["_change_type"], r["age"]) for r in df.collect())
    assert got == [
        (1, "update_postimage", 99),
        (1, "update_preimage", 25),
        (9, "insert", 40),
    ]
    m = t.history(1).collect()[0]["operationMetrics"]
    assert int(m["numTargetChangeFilesAdded"]) >= 1


def test_cdf_missing_change_data_detected(spark, tmpdir_path):
    # scenario: purged _change_data (ChangeDataFeedHelperSpec.scala:79-107)
    path, t = _cdf_table(spark, tmpdir_path, name="purge")
    t.delete("id = 1")
    t.delete("id = 2")
    t.delete("id = 3")
    # purge version 1's change file (simulated vacuum)
    import urllib.parse

    actions = t.deltaLog.read_actions(1)
    cdc_path = next(a["cdc"]["path"] for a in actions if "cdc" in a)
    os.remove(os.path.join(path, urllib.parse.unquote(cdc_path)))
    helper = ChangeDataFeedHelper(spark, path, 1, 3)
    # parity shape: ChangeDataFeedHelperSpec.scala:79-92 — first version
    # with a surviving CDC file through the end
    assert helper.get_versions_for_available_cdc() == (2, 3)
    with pytest.raises(FileNotFoundError):
        read_cdf(spark, path, 1, 3)
    recovered = helper.read_cdf_ignore_missing_cdc()
    assert recovered.count() == 2  # versions 2 and 3's delete rows


def test_cdf_deleted_log_detected(spark, tmpdir_path):
    # scenario: deleted log json (ChangeDataFeedHelperSpec.scala:41-78)
    path, t = _cdf_table(spark, tmpdir_path, name="dellog")
    for i in range(12):
        t.update("id = 2", {"age": str(30 + i)})
    t.deltaLog.write_checkpoint()
    os.remove(t.deltaLog.commit_file_path(0))
    helper = ChangeDataFeedHelper(spark, path, 0, 12)
    got = helper.get_versions_for_available_delta_log()
    assert got is not None and got[0] > 0  # clamped to reachable versions


def test_group_versions_inclusive_quirks():
    from jodie_spark.operators.cdf import group_versions_inclusive

    # parity: ChangeDataFeedHelper.scala:295-315 — size 0 and 1 → None
    assert group_versions_inclusive([]) is None
    assert group_versions_inclusive([5]) is None
    assert group_versions_inclusive([0, 1, 2, 5, 6]) == [(0, 2), (5, 6)]
    # quirk preserved: isolated leading version keeps the -1 end marker
    assert group_versions_inclusive([0, 2, 3]) == [(0, -1), (2, 3)]


def test_cdf_enable_disable_ranges(spark, tmpdir_path):
    # scenario: enable-disable-re-enable (ChangeDataFeedHelperSpec.scala:108-141)
    path, t = _cdf_table(spark, tmpdir_path, name="edr")
    t.delete("id = 1")                                    # v1 cdc
    t.set_properties({"delta.enableChangeDataFeed": "false"})  # v2
    t.delete("id = 2")                                    # v3 no cdc
    t.set_properties({"delta.enableChangeDataFeed": "true"})   # v4
    t.delete("id = 3")                                    # v5 cdc
    helper = ChangeDataFeedHelper(spark, path, 0, 5)
    status = dict(helper.get_all_versions_with_cdf_status())
    assert status[1] is True and status[3] is False and status[5] is True
    ranges = helper.get_ranges_for_cdf_enabled_versions()
    assert ranges is not None
    df = helper.read_cdf_ignore_missing_ranges_for_edr()
    assert df is not None


def test_read_cdf_synthesizes_deletes_for_remove_only_commits(spark, tmpdir_path):
    # ADVICE regression: full-table delete (delete(None)) and overwrite
    # write no cdc files; their deletes must be synthesized from the
    # dataChange remove actions (reading the not-yet-vacuumed files).
    path, t = _cdf_table(spark, tmpdir_path, name="rmonly")
    t.delete(None)  # v1: remove-only commit
    df = read_cdf(spark, path, 1, 1)
    got = sorted((r["id"], r["_change_type"], r["_commit_version"]) for r in df.collect())
    assert got == [(1, "delete", 1), (2, "delete", 1), (3, "delete", 1)]

    # overwrite: removes + adds in one commit → deletes + inserts
    path2, t2 = _cdf_table(spark, tmpdir_path, name="ovw")
    write_delta(
        spark.createDataFrame([(9, "x", 1)], "id int, gender string, age int"),
        path2,
        mode="overwrite",
    )
    df2 = read_cdf(spark, path2, 1, 1)
    got2 = sorted((r["id"], r["_change_type"]) for r in df2.collect())
    assert got2 == [(1, "delete"), (2, "delete"), (3, "delete"), (9, "insert")]


def test_non_dml_commits_excluded_unless_opted_in(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "nondml")
    write_delta(spark.range(5).selectExpr("id", "cast(id as string) v"), p)  # v0 WRITE
    t = DeltaTable.forPath(spark, p)
    t.delete("id = 0")                        # v1 DELETE
    t.restore(0)                              # v2 RESTORE
    t.optimize().executeCompaction()          # v3 OPTIMIZE

    default = OperationMetricHelper(spark, p).get_count_metrics()
    assert [r[0] for r in default] == [1, 0]  # newest-first, DML only

    rows = OperationMetricHelper(spark, p).get_count_metrics(include_non_dml=True)
    assert [r[0] for r in rows] == [3, 2, 1, 0]
    assert rows[0][1:] == (0, 0, 0, 0) and rows[1][1:] == (0, 0, 0, 0)


def test_read_cdf_by_timestamp(spark, tmpdir_path):
    import datetime as dt
    import time as _time

    p = os.path.join(tmpdir_path, "cdfts")
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]),
        p,
        options={"delta.enableChangeDataFeed": "true"},
    )
    t = DeltaTable.forPath(spark, p)
    _time.sleep(0.05)
    mid = dt.datetime.now(tz=dt.timezone.utc)
    _time.sleep(0.05)
    t.update("k = 1", {"v": "'a2'"})

    # from the beginning: insert + update pre/post images
    all_rows = read_cdf(spark, p, starting_timestamp=0).collect()
    types = sorted(r["_change_type"] for r in all_rows)
    assert types == ["insert", "insert", "update_postimage", "update_preimage"]
    # from mid: only the update
    later = read_cdf(spark, p, starting_timestamp=mid).collect()
    assert sorted(r["_change_type"] for r in later) == [
        "update_postimage", "update_preimage",
    ]


def test_read_cdf_on_column_mapped_table(spark, tmpdir_path):
    """CDF synthesis over a mapped table must scan physical names and
    rename back (it previously returned all-null data columns)."""
    import os

    from jodie_spark.operators.cdf import ChangeDataFeedHelper
    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "cdf_mapped_op")
    write_delta(
        spark.createDataFrame([(1, "a")], "id long, v string"),
        p,
        options={
            "delta.columnMapping.mode": "name",
            "delta.enableChangeDataFeed": "true",
        },
    )
    DeltaTable.forPath(spark, p).rename_column("v", "val")
    write_delta(spark.createDataFrame([(2, "b")], "id long, val string"), p, mode="append")
    cdf = ChangeDataFeedHelper(spark, p, 0).read_cdf()
    rows = sorted((r["id"], r["val"], r["_change_type"]) for r in cdf.collect())
    assert rows == [(1, "a", "insert"), (2, "b", "insert")]


def test_write_metric_partition_quote_and_case(spark, tmpdir_path):
    """Parity: OperationMetricHelperSpec.scala:96-105, 131-140 — quoted
    partition values match (quotes stripped), wrong-case values return
    0 (path-substring matching is case-sensitive)."""
    import os

    from jodie_spark.operators.metrics import OperationMetricHelper
    from jodie_spark.tables.table import write_delta

    p = os.path.join(tmpdir_path, "metric_qc")
    write_delta(
        spark.createDataFrame(
            [(1, "USA"), (2, "USA"), (3, "France")], "id long, country string"
        ),
        p,
        partition_by=["country"],
    )
    h = OperationMetricHelper(spark, p)
    assert h.get_write_metric_by_partition("country = 'USA'", 0) == 2
    assert h.get_write_metric_by_partition("country = USA", 0) == 2
    assert h.get_write_metric_by_partition("country = usa", 0) == 0  # case-sensitive
    assert h.get_write_metric_by_partition("country = 'France'", 0) == 1


def test_cdf_dml_on_column_mapped_table(spark, tmpdir_path):
    """Mapped tables + CDF DML (previously refused): cdc files store
    physical names; both the read_cdf operator and the datasource
    resolve them back to logical."""
    import os

    from jodie_spark.operators.cdf import ChangeDataFeedHelper
    from jodie_spark.sources.datasource import register
    from jodie_spark.tables.table import DeltaTable, write_delta

    register(spark)
    p = os.path.join(tmpdir_path, "cdf_map_dml")
    write_delta(
        spark.createDataFrame([(i, f"v{i}") for i in range(6)], "id long, v string"),
        p,
        options={
            "delta.columnMapping.mode": "name",
            "delta.enableChangeDataFeed": "true",
        },
    )
    t = DeltaTable.forPath(spark, p)
    t.rename_column("v", "val")
    DeltaTable.forPath(spark, p).delete("id >= 4")
    DeltaTable.forPath(spark, p).update("id = 0", {"val": "'zero'"})
    src = spark.createDataFrame([(1, "one"), (9, "nine")], "id long, val string")
    (
        DeltaTable.forPath(spark, p).alias("t")
        .merge(src.alias("s"), "t.id = s.id")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    cdf = ChangeDataFeedHelper(spark, p, 0).read_cdf()
    changes = sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["val"])
        for r in cdf.collect()
    )
    # v0 inserts ×6, v2 deletes ×2, v3 update pre+post, v4 merge
    assert (2, "delete", 4, "v4") in changes and (2, "delete", 5, "v5") in changes
    assert (3, "update_preimage", 0, "v0") in changes
    assert (3, "update_postimage", 0, "zero") in changes
    assert (4, "update_postimage", 1, "one") in changes
    assert (4, "insert", 9, "nine") in changes
    # datasource CDF agrees
    ds = (
        spark.read.format("jodie_delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", 0)
        .load(p)
    )
    got = sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["val"])
        for r in ds.collect()
    )
    assert got == changes
    # final table state correct
    rows = sorted(tuple(r) for r in DeltaTable.forPath(spark, p).toDF().collect())
    assert rows == [(0, "zero"), (1, "one"), (2, "v2"), (3, "v3"), (9, "nine")]
