"""jodie_delta Python DataSource: batch read (with stats-pruning
pushFilters), incremental stream read, append/overwrite write."""

import os

import pytest

from jodie_spark.sources.datasource import register
from jodie_spark.tables.table import DeltaTable, write_delta


@pytest.fixture()
def registered(spark):
    register(spark)
    return spark


def test_batch_read_respects_log(registered, tmpdir_path):
    spark = registered
    p = os.path.join(tmpdir_path, "ds_t")
    df = spark.range(0, 100).selectExpr(
        "id", "cast(id % 3 as string) as p", "cast(id as string) as v"
    )
    write_delta(df.repartition(3), p, partition_by=["p"])
    t = DeltaTable.forPath(spark, p)
    t.delete("id < 10")  # removed files must not be read

    got = spark.read.format("jodie_delta").load(p)
    assert got.count() == 90
    assert [f.name for f in got.schema.fields] == ["id", "p", "v"]
    # filters (incl. the hive partition column) return correct rows
    assert (
        got.filter("id >= 50 and p = '1'").count()
        == t.toDF().filter("id >= 50 and p = '1'").count()
    )
    assert sorted(r["id"] for r in got.filter("id < 12").collect()) == [10, 11]


def test_write_append_overwrite_and_stream(registered, tmpdir_path):
    spark = registered
    out = os.path.join(tmpdir_path, "ds_w")
    spark.range(5).selectExpr("id", "'x' as tag").write.format("jodie_delta").mode(
        "append"
    ).save(out)
    spark.range(5, 8).selectExpr("id", "'y' as tag").write.format("jodie_delta").mode(
        "append"
    ).save(out)
    t = DeltaTable.forPath(spark, out)
    assert t.toDF().count() == 8
    assert t.deltaLog.latest_version() == 1

    spark.range(2).selectExpr("id", "'z' as tag").write.format("jodie_delta").mode(
        "overwrite"
    ).save(out)
    assert DeltaTable.forPath(spark, out).toDF().count() == 2

    # stream: first batch = snapshot, later batches = appended commits
    q = (
        spark.readStream.format("jodie_delta").load(out)
        .writeStream.format("memory").queryName("ds_s1")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    assert spark.table("ds_s1").count() == 2
    write_delta(spark.range(10, 13).selectExpr("id", "'w' as tag"), out, mode="append")
    q2 = (
        spark.readStream.format("jodie_delta").load(out)
        .writeStream.format("memory").queryName("ds_s2")
        .trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    assert spark.table("ds_s2").count() == 5


def test_stream_rejects_data_removal(registered, tmpdir_path):
    spark = registered
    out = os.path.join(tmpdir_path, "ds_rm")
    write_delta(spark.range(10).repartition(1).selectExpr("id", "'a' as tag"), out)
    from jodie_spark.sources.datasource import JodieDeltaStreamReader

    t = DeltaTable.forPath(spark, out)
    t.delete("id < 5")
    reader = JodieDeltaStreamReader({"path": out}, t.schema())
    with pytest.raises(RuntimeError, match="append-only"):
        reader.partitions({"version": 0}, {"version": t.deltaLog.latest_version()})
    # ignoreChanges skips the removes and serves the adds
    tolerant = JodieDeltaStreamReader({"path": out, "ignoreChanges": "true"}, t.schema())
    parts = tolerant.partitions({"version": 0}, {"version": t.deltaLog.latest_version()})
    assert len(parts) >= 1


def test_version_as_of_and_filter_pruning(registered, tmpdir_path):
    spark = registered
    p = os.path.join(tmpdir_path, "ds_tt")
    df = spark.range(0, 60).selectExpr("id", "cast(id % 3 as string) as p")
    write_delta(df.repartition("p"), p, partition_by=["p"])  # one file per p
    t = DeltaTable.forPath(spark, p)
    t.delete("p = '2'")

    assert spark.read.format("jodie_delta").load(p).count() == 40
    old = spark.read.format("jodie_delta").option("versionAsOf", 0).load(p)
    assert old.count() == 60

    # pushFilters prunes whole files before Spark schedules tasks
    from pyspark.sql.datasource import EqualTo

    from jodie_spark.sources.datasource import JodieDeltaBatchReader

    reader = JodieDeltaBatchReader({"path": p}, t.schema())
    all_parts = reader.partitions()
    reader2 = JodieDeltaBatchReader({"path": p}, t.schema())
    reader2.pushFilters([EqualTo(("p",), "1")])
    pruned = reader2.partitions()
    assert len(pruned) < len(all_parts)
    assert len(pruned) >= 1


def test_stream_write_end_to_end_exactly_once(registered, tmpdir_path):
    """Full streaming loop through the format: Delta source table →
    readStream → writeStream → Delta sink table, with txn-recorded
    batch ids giving exactly-once across restarts."""
    spark = registered
    src = os.path.join(tmpdir_path, "ds_stream_src")
    dst = os.path.join(tmpdir_path, "ds_stream_dst")
    ckpt = os.path.join(tmpdir_path, "ds_ckpt")
    write_delta(spark.range(10).selectExpr("id", "'a' as tag"), src)

    def run_stream():
        q = (
            spark.readStream.format("jodie_delta").load(src)
            .writeStream.format("jodie_delta")
            .option("checkpointLocation", ckpt)
            .option("appId", "e2e_test")
            .trigger(availableNow=True)
            .start(dst)
        )
        q.awaitTermination(120)

    run_stream()
    t = DeltaTable.forPath(spark, dst)
    assert t.toDF().count() == 10

    # restart with the same checkpoint: nothing new, no duplicates
    run_stream()
    assert DeltaTable.forPath(spark, dst).toDF().count() == 10

    # append upstream, restart: only the new rows flow
    write_delta(spark.range(10, 15).selectExpr("id", "'b' as tag"), src, mode="append")
    run_stream()
    assert DeltaTable.forPath(spark, dst).toDF().count() == 15
    assert sorted(r["id"] for r in DeltaTable.forPath(spark, dst).toDF().collect()) == list(range(15))

    # the sink history records the txn batch ids
    from jodie_spark.tables.log import DeltaLog

    txns = [
        a["txn"]
        for v in DeltaLog(dst).list_commit_versions()
        for a in DeltaLog(dst).read_actions(v)
        if a.get("txn")
    ]
    assert {t["appId"] for t in txns} == {"e2e_test"}


def test_stream_complete_mode_replaces_contents(registered, tmpdir_path):
    spark = registered
    src = os.path.join(tmpdir_path, "cm_src")
    dst = os.path.join(tmpdir_path, "cm_dst")
    ckpt = os.path.join(tmpdir_path, "cm_ckpt")
    write_delta(spark.range(6).selectExpr("id", "cast(id % 2 as string) as tag"), src)

    import pyspark.sql.functions as F

    def run():
        q = (
            spark.readStream.format("jodie_delta").load(src)
            .groupBy("tag").agg(F.count(F.lit(1)).alias("n"))
            .writeStream.format("jodie_delta")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .option("appId", "cm_test")
            .trigger(availableNow=True)
            .start(dst)
        )
        q.awaitTermination(120)

    run()
    got = {r["tag"]: r["n"] for r in DeltaTable.forPath(spark, dst).toDF().collect()}
    assert got == {"0": 3, "1": 3}
    # upstream grows; complete mode replaces, never accumulates
    write_delta(spark.range(6, 10).selectExpr("id", "'0' as tag"), src, mode="append")
    run()
    got = {r["tag"]: r["n"] for r in DeltaTable.forPath(spark, dst).toDF().collect()}
    assert got == {"0": 7, "1": 3}


# ---------------------------------------------------------------------------
# change-data-feed read path (readChangeFeed=true)
# ---------------------------------------------------------------------------

def _cdf_fixture(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "cdf_t")
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string"),
        p,
        options={"delta.enableChangeDataFeed": "true"},
    )
    t = DeltaTable.forPath(spark, p)
    t.delete("k = 2")
    t.update("k = 1", {"v": "'A'"})
    write_delta(
        spark.createDataFrame([(4, "d")], "k int, v string"), p, mode="append"
    )
    return p


def _rows(df):
    return sorted(
        (r["k"], r["v"], r["_change_type"], r["_commit_version"]) for r in df.collect()
    )


def test_cdf_batch_read_matches_operator(registered, tmpdir_path):
    from jodie_spark.operators.cdf import read_cdf

    spark = registered
    p = _cdf_fixture(spark, tmpdir_path)
    via_ds = (
        spark.read.format("jodie_delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .load(p)
    )
    assert _rows(via_ds) == _rows(read_cdf(spark, p, 0))
    # change columns typed correctly and timestamps populated
    ts = [r["_commit_timestamp"] for r in via_ds.collect()]
    assert all(t is not None for t in ts)
    # bounded range
    bounded = (
        spark.read.format("jodie_delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .option("endingVersion", "1")
        .load(p)
    )
    assert _rows(bounded) == [(2, "b", "delete", 1)]


def test_cdf_stream_replays_then_follows(registered, tmpdir_path):
    spark = registered
    p = _cdf_fixture(spark, tmpdir_path)
    dst = os.path.join(tmpdir_path, "cdf_sink")

    def run():
        q = (
            spark.readStream.format("jodie_delta")
            .option("readChangeFeed", "true")
            .option("startingVersion", "0")
            .load(p)
            .writeStream.format("jodie_delta")
            .option(
                "checkpointLocation", os.path.join(tmpdir_path, "cdf_ckpt")
            )
            .option("appId", "cdf_replay_test")
            .trigger(availableNow=True)
            .start(dst)
        )
        q.awaitTermination(120)

    run()
    got = _rows(DeltaTable.forPath(spark, dst).toDF())
    assert (2, "b", "delete", 1) in got
    assert (1, "a", "update_preimage", 2) in got and (1, "A", "update_postimage", 2) in got
    assert len(got) == 7
    # stream resumes from the checkpoint: only NEW commits arrive
    DeltaTable.forPath(spark, p).delete("k = 4")
    run()
    got2 = _rows(DeltaTable.forPath(spark, dst).toDF())
    assert len(got2) == len(got) + 1
    assert (4, "d", "delete", 4) in got2


def test_cdf_stream_default_starts_at_latest(registered, tmpdir_path):
    spark = registered
    p = _cdf_fixture(spark, tmpdir_path)
    dst = os.path.join(tmpdir_path, "cdfl_sink")

    def run():
        q = (
            spark.readStream.format("jodie_delta")
            .option("readChangeFeed", "true")
            .load(p)
            .writeStream.format("jodie_delta")
            .option(
                "checkpointLocation", os.path.join(tmpdir_path, "cdfl_ckpt")
            )
            .option("appId", "cdf_latest_test")
            .trigger(availableNow=True)
            .start(dst)
        )
        q.awaitTermination(120)

    run()
    # no history replay: the sink table may not even exist yet
    from jodie_spark.tables.log import DeltaLog

    n0 = (
        DeltaTable.forPath(spark, dst).toDF().count()
        if DeltaLog(dst).exists()
        else 0
    )
    assert n0 == 0
    write_delta(
        spark.createDataFrame([(9, "z")], "k int, v string"), p, mode="append"
    )
    run()
    assert _rows(DeltaTable.forPath(spark, dst).toDF()) == [(9, "z", "insert", 4)]


def test_cdf_read_refuses_uncovered_range(registered, tmpdir_path):
    from py4j.protocol import Py4JJavaError

    spark = registered
    p = os.path.join(tmpdir_path, "nocdf")
    write_delta(spark.createDataFrame([(1, "a")], "k int, v string"), p)
    DeltaTable.forPath(spark, p).delete("k = 1")
    with pytest.raises(Exception, match="change data was not recorded|DeltaProtocolError"):
        (
            spark.read.format("jodie_delta")
            .option("readChangeFeed", "true")
            .option("startingVersion", "0")
            .load(p)
            .collect()
        )


def test_datasource_reads_column_mapped_table(spark, tmpdir_path):
    """The Python datasource must resolve physical parquet names on a
    mapped table (it previously returned all-null columns silently)."""
    import os

    from jodie_spark.sources.datasource import register
    from jodie_spark.tables.table import DeltaTable, write_delta

    register(spark)
    p = os.path.join(tmpdir_path, "ds_mapped")
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        p,
        options={"delta.columnMapping.mode": "name"},
    )
    t = DeltaTable.forPath(spark, p)
    t.rename_column("v", "val")
    df = spark.read.format("jodie_delta").load(p)
    assert sorted((r["id"], r["val"]) for r in df.collect()) == [(1, "a"), (2, "b")]
    # renamed-away logical name is gone, values intact (not nulls)
    assert "v" not in df.columns


def test_datasource_reads_field_id_mapped_table(spark, tmpdir_path):
    """Column mapping mode=id through the Python datasource: executor
    pyarrow readers match parquet columns by FOOTER FIELD ID (the
    datasource previously refused mode=id outright). The fixture is a
    FOREIGN id-mapped table (parquet column names differ from
    physicalName — only footer field ids line up), with nested data
    and a Hive-partition column keyed by physical name."""
    from test_table import _mk_id_mapped_table

    from jodie_spark.sources.datasource import register
    from jodie_spark.tables.table import DeltaTable

    register(spark)
    p = _mk_id_mapped_table(tmpdir_path, spark)
    df = spark.read.format("jodie_delta").load(p)
    assert [f.name for f in df.schema.fields] == ["id", "info", "part"]
    rows = sorted((r["id"], r["info"]["score"], r["part"]) for r in df.collect())
    assert rows == [(1, 0.5, "x"), (2, 1.0, "x"), (3, 1.5, "y")]
    # matches the package-surface (field-id child session) read
    pkg = sorted(
        (r["id"], r["info"]["score"], r["part"])
        for r in DeltaTable.forPath(spark, p).toDF().collect()
    )
    assert pkg == rows


def test_datasource_field_id_non_nullable_nested(spark, tmpdir_path):
    """Regression (round-9 review): _fid_align rebuilt structs with
    all-nullable children, and pyarrow refuses to cast a nullable
    child to a non-nullable target even with zero nulls — a mode=id
    schema with a nested nullable:false field crashed the scan. The
    rebuild must carry the target fields' nullability directly."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from jodie_spark.sources.datasource import register

    path = os.path.join(tmpdir_path, "fid_nn")
    os.makedirs(os.path.join(path, "_delta_log"))
    sch = pa.schema(
        [
            pa.field(
                "zz_s",
                pa.struct(
                    [
                        pa.field(
                            "zz_a",
                            pa.int64(),
                            nullable=False,
                            metadata={b"PARQUET:field_id": b"2"},
                        )
                    ]
                ),
                metadata={b"PARQUET:field_id": b"1"},
            )
        ]
    )
    pq.write_table(
        pa.table({"zz_s": [{"zz_a": 5}, {"zz_a": 6}]}, schema=sch),
        os.path.join(path, "f.parquet"),
    )
    schema_string = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "s",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": "col-s",
                    },
                    "type": {
                        "type": "struct",
                        "fields": [
                            {
                                "name": "a",
                                "type": "long",
                                "nullable": False,
                                "metadata": {
                                    "delta.columnMapping.id": 2,
                                    "delta.columnMapping.physicalName": "col-a",
                                },
                            }
                        ],
                    },
                }
            ],
        }
    )
    meta = {
        "id": "fidnn",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": schema_string,
        "partitionColumns": [],
        "configuration": {
            "delta.columnMapping.mode": "id",
            "delta.columnMapping.maxColumnId": "2",
        },
        "createdTime": 0,
    }
    with open(os.path.join(path, "_delta_log", "%020d.json" % 0), "w") as fh:
        fh.write(
            json.dumps({"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}})
            + "\n"
        )
        fh.write(json.dumps({"metaData": meta}) + "\n")
        fh.write(
            json.dumps(
                {
                    "add": {
                        "path": "f.parquet",
                        "partitionValues": {},
                        "size": os.path.getsize(os.path.join(path, "f.parquet")),
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
    register(spark)
    vals = sorted(
        r["s"]["a"] for r in spark.read.format("jodie_delta").load(path).collect()
    )
    assert vals == [5, 6]


def test_cdf_datasource_on_column_mapped_appends(spark, tmpdir_path):
    """CDF over a mapped table: appends are legal on mapped tables and
    their synthesized insert rows must resolve physical names."""
    import os

    from jodie_spark.sources.datasource import register
    from jodie_spark.tables.table import DeltaTable, write_delta

    register(spark)
    p = os.path.join(tmpdir_path, "cdf_mapped")
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
    cdf = (
        spark.read.format("jodie_delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", 0)
        .load(p)
    )
    rows = sorted((r["id"], r["val"], r["_change_type"]) for r in cdf.collect())
    assert rows == [(1, "a", "insert"), (2, "b", "insert")]


def test_datasource_time_travel_pins_schema(spark, tmpdir_path):
    """versionAsOf must surface that version's schema, not the latest
    one (delta parity for reads across a rename/add-column)."""
    import os

    from jodie_spark.sources.datasource import register
    from jodie_spark.tables.table import DeltaTable, write_delta

    register(spark)
    p = os.path.join(tmpdir_path, "ds_tt_schema")
    write_delta(
        spark.createDataFrame([(1, "a")], "id long, v string"),
        p,
        options={"delta.columnMapping.mode": "name"},
    )
    DeltaTable.forPath(spark, p).rename_column("v", "val")
    write_delta(spark.createDataFrame([(2, "b")], "id long, val string"), p, mode="append")

    latest = spark.read.format("jodie_delta").load(p)
    assert set(latest.columns) == {"id", "val"}
    pinned = spark.read.format("jodie_delta").option("versionAsOf", 0).load(p)
    assert set(pinned.columns) == {"id", "v"}
    assert sorted((r["id"], r["v"]) for r in pinned.collect()) == [(1, "a")]


def test_datasource_reads_evolution_merged_mapped_table(spark, tmpdir_path):
    """The pyarrow-based datasource NULL-fills evolved columns for
    pre-evolution files of a mapped table (fresh col-<uuid> physical
    names absent from old parquet footers)."""
    import os

    from jodie_spark.sources.datasource import register
    from jodie_spark.tables.table import DeltaTable, write_delta

    register(spark)
    p = os.path.join(tmpdir_path, "dsev")
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
        p,
        options={"delta.columnMapping.mode": "name"},
    )
    t = DeltaTable.forPath(spark, p)
    src = spark.createDataFrame([(2, "B", 7), (3, "C", 9)], "k int, v string, score int")
    (
        t.alias("t")
        .merge(src.alias("s"), "t.k = s.k")
        .withSchemaEvolution()
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    rows = sorted(
        (r["k"], r["v"], r["score"])
        for r in spark.read.format("jodie_delta").load(p).collect()
    )
    assert rows == [(1, "a", None), (2, "B", 7), (3, "C", 9)]


def test_cdf_datasource_timestamp_options(spark, tmpdir_path):
    """startingTimestamp / endingTimestamp on the CDF datasource resolve
    through the commit clock exactly like delta-spark's options: the
    batch read covers (at-or-after start) .. (at-or-before end)."""
    import os

    from jodie_spark.sources.datasource import register
    from jodie_spark.tables.table import DeltaTable, write_delta

    register(spark)
    p = os.path.join(tmpdir_path, "cdfts")
    write_delta(
        spark.createDataFrame([(1, "a")], "k int, v string"),
        p,
        options={"delta.enableChangeDataFeed": "true"},
    )
    t = DeltaTable.forPath(spark, p)
    write_delta(spark.createDataFrame([(2, "b")], "k int, v string"), p, mode="append")
    DeltaTable.forPath(spark, p).delete("k = 1")
    hist = {r["version"]: r["timestamp"] for r in t.history().collect()}

    got = (
        spark.read.format("jodie_delta")
        .option("readChangeFeed", "true")
        .option("startingTimestamp", hist[1].isoformat())
        .option("endingTimestamp", hist[1].isoformat())
        .load(p)
        .collect()
    )
    assert [(r["k"], r["_change_type"], r["_commit_version"]) for r in got] == [
        (2, "insert", 1)
    ]
    # full range from v0's stamp covers all three commits
    got2 = (
        spark.read.format("jodie_delta")
        .option("readChangeFeed", "true")
        .option("startingTimestamp", hist[0].isoformat())
        .load(p)
        .collect()
    )
    assert sorted((r["_commit_version"], r["_change_type"]) for r in got2) == [
        (0, "insert"), (1, "insert"), (2, "delete"),
    ]


def test_plain_stream_starting_version_and_timestamp(spark, tmpdir_path):
    """The non-CDF stream reader honors startingVersion and
    startingTimestamp: the replay begins at the chosen commit instead
    of the full-snapshot first batch."""
    import os

    from jodie_spark.sources.datasource import register
    from jodie_spark.tables.table import DeltaTable, write_delta

    register(spark)
    p = os.path.join(tmpdir_path, "pstream")
    write_delta(spark.createDataFrame([(1,)], "k int"), p)
    write_delta(spark.createDataFrame([(2,)], "k int"), p, mode="append")
    write_delta(spark.createDataFrame([(3,)], "k int"), p, mode="append")
    hist = {
        r["version"]: r["timestamp"]
        for r in DeltaTable.forPath(spark, p).history().collect()
    }

    def drain(reader):
        out = os.path.join(tmpdir_path, f"sink{reader}")
        q = (
            globals()[f"_mk_{reader}"]
            .writeStream.format("memory")
            .queryName(f"ps_{reader}")
            .option("checkpointLocation", out)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            r["k"] for r in spark.sql(f"select * from ps_{reader}").collect()
        )

    globals()["_mk_v1"] = (
        spark.readStream.format("jodie_delta").option("startingVersion", 1).load(p)
    )
    assert drain("v1") == [2, 3]
    globals()["_mk_ts"] = (
        spark.readStream.format("jodie_delta")
        .option("startingTimestamp", hist[2].isoformat())
        .load(p)
    )
    assert drain("ts") == [3]


def test_plain_stream_starting_version_zero_replays_history(spark, tmpdir_path):
    """Regression (round-9 advice): startingVersion=0 encoded the same
    {"version": -1} offset as the full-snapshot default, so the first
    batch served the CURRENT snapshot — silently skipping the
    remove-detection error ignoreChanges gates, and streaming post-
    delete rows instead of the commit-0..N replay delta-spark does."""
    import os

    import pytest

    from jodie_spark.sources.datasource import JodieDeltaStreamReader, register
    from jodie_spark.tables.table import DeltaTable, write_delta

    register(spark)
    p = os.path.join(tmpdir_path, "sv0")
    write_delta(spark.range(10).repartition(1).selectExpr("id", "'a' as tag"), p)
    t = DeltaTable.forPath(spark, p)
    t.delete("id < 5")  # history now contains a remove
    latest = t.deltaLog.latest_version()

    # startingVersion=0 must replay commits and hit the remove gate
    r0 = JodieDeltaStreamReader({"path": p, "startingVersion": "0"}, t.schema())
    start = r0.initialOffset()
    assert not start.get("snapshot")
    with pytest.raises(RuntimeError, match="append-only"):
        r0.partitions(start, {"version": latest})

    # with ignoreChanges it replays commit 0's add AND the delete's
    # rewrite file (per-commit adds), not just the current snapshot
    r1 = JodieDeltaStreamReader(
        {"path": p, "startingVersion": "0", "ignoreChanges": "true"}, t.schema()
    )
    parts = r1.partitions(r1.initialOffset(), {"version": latest})
    assert len(parts) == 2  # v0 original file + v1 rewritten file

    # the DEFAULT (no startingVersion) still serves the snapshot first
    # batch and never trips the gate
    rd = JodieDeltaStreamReader({"path": p}, t.schema())
    d0 = rd.initialOffset()
    assert d0.get("snapshot") and d0["version"] == -1
    snap_parts = rd.partitions(d0, {"version": latest})
    assert len(snap_parts) == 1  # current snapshot: one live file

    # end-to-end: default stream on the post-delete table yields only
    # surviving rows
    q = (
        spark.readStream.format("jodie_delta")
        .load(p)
        .writeStream.format("memory")
        .queryName("sv0_default")
        .option("checkpointLocation", os.path.join(tmpdir_path, "sv0_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["id"] for r in spark.sql("select * from sv0_default").collect())
    assert got == [5, 6, 7, 8, 9]


def test_empty_table_and_fully_pruned_scans(spark, tmpdir_path):
    """Regression: partitions() returning an empty list makes Spark
    call read(None) — an empty table (delete-all) or a fully
    stats-pruned scan through the datasource crashed with
    AttributeError instead of yielding zero rows (found by the lineage
    property test). All four readers guard the None partition now."""
    import os

    from jodie_spark.sources.datasource import register
    from jodie_spark.tables.table import DeltaTable, write_delta

    register(spark)
    p = os.path.join(tmpdir_path, "empt")
    write_delta(
        spark.createDataFrame([(1, "a")], "k int, v string"),
        p,
        options={"delta.enableChangeDataFeed": "true"},
    )
    DeltaTable.forPath(spark, p).delete()  # zero live files
    assert spark.read.format("jodie_delta").load(p).count() == 0

    p2 = os.path.join(tmpdir_path, "pruned")
    write_delta(spark.createDataFrame([(i,) for i in range(10)], "k int"), p2)
    assert (
        spark.read.format("jodie_delta").load(p2).filter("k > 100").count() == 0
    )
    # CDF batch read over a version range with no change files
    write_delta(spark.createDataFrame([], "k int, v string"), p, mode="append")
    n = (
        spark.read.format("jodie_delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", "2")
        .load(p)
        .count()
    )
    assert n == 0


def test_stream_remove_option_semantics(spark, tmpdir_path):
    """ignoreDeletes / ignoreChanges / skipChangeCommits are DISTINCT
    (delta-spark DeltaSource parity; they used to alias here):
    ignoreDeletes tolerates delete-only commits but still fails on
    rewrites; ignoreChanges serves rewrite adds; skipChangeCommits
    drops change commits entirely."""
    import os

    import pytest

    from jodie_spark.sources.datasource import JodieDeltaStreamReader
    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "remopts")
    write_delta(
        spark.range(10).selectExpr("id", "id % 2 as part").repartition("part"),
        p,
        partition_by=["part"],
    )
    t = DeltaTable.forPath(spark, p)
    t.delete("part = 1")  # v1: delete-only commit (full-partition drop)
    t.update("id = 0", {"id": "100"})  # v2: rewrite (remove + add)
    latest = t.deltaLog.latest_version()

    def parts(opts):
        r = JodieDeltaStreamReader({"path": p, **opts}, t.schema())
        return r.partitions(
            {"version": 0}, {"version": latest}
        )

    # default: the delete-only commit already fails the stream
    with pytest.raises(RuntimeError, match="append-only"):
        parts({})
    # ignoreDeletes skips v1 but the v2 REWRITE still fails
    with pytest.raises(RuntimeError, match="append-only"):
        parts({"ignoreDeletes": "true"})
    # ...unless only v1 is in range
    r = JodieDeltaStreamReader({"path": p, "ignoreDeletes": "true"}, t.schema())
    assert r.partitions({"version": 0}, {"version": 1}) == []
    # ignoreChanges serves the rewrite's adds (v2 emits one file)
    assert len(parts({"ignoreChanges": "true"})) == 1
    # skipChangeCommits drops BOTH change commits wholesale
    assert parts({"skipChangeCommits": "true"}) == []


def test_stream_max_files_per_trigger(spark, tmpdir_path):
    """maxFilesPerTrigger bounds how far latestOffset advances per
    micro-batch (commit granularity): three 1-file appends with
    maxFilesPerTrigger=1 drain in three planned batches, and the
    end-to-end availableNow run still serves every row exactly once."""
    import os

    from jodie_spark.sources.datasource import JodieDeltaStreamReader, register
    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "mft")
    write_delta(spark.range(1).selectExpr("id"), p)  # v0
    for i in range(1, 4):  # v1..v3, one file each
        write_delta(
            spark.range(i * 10, i * 10 + 1).selectExpr("id"), p, mode="append"
        )
    t = DeltaTable.forPath(spark, p)

    r = JodieDeltaStreamReader(
        {"path": p, "startingVersion": "1", "maxFilesPerTrigger": "1"}, t.schema()
    )
    start = r.initialOffset()
    o1 = r.latestOffset()
    o2 = r.latestOffset()
    o3 = r.latestOffset()
    o4 = r.latestOffset()  # caught up: stays put
    assert [start["version"], o1["version"], o2["version"], o3["version"]] == [
        0, 1, 2, 3,
    ]
    assert o4["version"] == 3
    assert len(r.partitions(start, o1)) == 1

    # end-to-end: rate-limited availableNow still drains everything
    register(spark)
    q = (
        spark.readStream.format("jodie_delta")
        .option("startingVersion", 0)
        .option("maxFilesPerTrigger", 1)
        .load(p)
        .writeStream.format("memory")
        .queryName("mft_sink")
        .option("checkpointLocation", os.path.join(tmpdir_path, "mft_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["id"] for r in spark.sql("select * from mft_sink").collect())
    assert got == [0, 10, 20, 30]


def test_cdf_stream_max_files_per_trigger(spark, tmpdir_path):
    """maxFilesPerTrigger on the CDF stream: three appended commits
    with a budget of 1 plan three bounded batches, and the rate-limited
    availableNow replay still delivers every change row exactly once."""
    import os

    from jodie_spark.sources.datasource import JodieDeltaCdfStreamReader, register
    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "cdfmft")
    write_delta(
        spark.range(1).selectExpr("id"),
        p,
        options={"delta.enableChangeDataFeed": "true"},
    )
    for i in range(1, 4):
        write_delta(
            spark.range(i * 10, i * 10 + 1).selectExpr("id"), p, mode="append"
        )
    t = DeltaTable.forPath(spark, p)
    from jodie_spark.sources.datasource import _cdf_schema

    r = JodieDeltaCdfStreamReader(
        {"path": p, "startingVersion": "1", "maxFilesPerTrigger": "1"},
        _cdf_schema(t.schema()),
    )
    start = r.initialOffset()
    offs = [r.latestOffset()["version"] for _ in range(4)]
    assert start["version"] == 0 and offs == [1, 2, 3, 3]

    register(spark)
    q = (
        spark.readStream.format("jodie_delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", 0)
        .option("maxFilesPerTrigger", 1)
        .load(p)
        .writeStream.format("memory")
        .queryName("cdfmft_sink")
        .option("checkpointLocation", os.path.join(tmpdir_path, "cdfmft_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select id, _change_type from cdfmft_sink").collect()
    assert sorted(r["id"] for r in rows) == [0, 10, 20, 30]
    assert {r["_change_type"] for r in rows} == {"insert"}


def test_max_files_budget_matches_served_files(spark, tmpdir_path):
    """Round-9 review regressions: the rate-limiter budget must count
    what partitions() actually serves — skipChangeCommits'd rewrites
    cost nothing on the plain stream, and on the CDF stream a
    cdc-bearing commit costs its cdc files (not its unread adds) while
    a remove-only commit costs its synthesized-delete reads."""
    import os

    import pytest

    from jodie_spark.sources.datasource import (
        JodieDeltaCdfStreamReader,
        JodieDeltaStreamReader,
        _cdf_schema,
    )
    from jodie_spark.tables.table import DeltaTable, write_delta

    # invalid budgets are rejected loudly (delta-spark parity)
    pdummy = os.path.join(tmpdir_path, "dummy")
    write_delta(spark.range(1).selectExpr("id"), pdummy)
    tdummy = DeltaTable.forPath(spark, pdummy)
    with pytest.raises(ValueError, match="maxFilesPerTrigger"):
        JodieDeltaStreamReader(
            {"path": pdummy, "maxFilesPerTrigger": "0"}, tdummy.schema()
        )
    with pytest.raises(ValueError, match="maxFilesPerTrigger"):
        JodieDeltaCdfStreamReader(
            {"path": pdummy, "maxFilesPerTrigger": "-5"},
            _cdf_schema(tdummy.schema()),
        )

    # plain stream: a skipped rewrite commit must not eat the budget
    p = os.path.join(tmpdir_path, "budget")
    write_delta(spark.range(4).selectExpr("id").repartition(1), p)  # v0
    t = DeltaTable.forPath(spark, p)
    t.update("id = 0", {"id": "100"})  # v1: rewrite (skipped)
    write_delta(spark.range(10, 11).selectExpr("id"), p, mode="append")  # v2
    r = JodieDeltaStreamReader(
        {"path": p, "startingVersion": "1", "skipChangeCommits": "true",
         "maxFilesPerTrigger": "1"},
        t.schema(),
    )
    r.initialOffset()
    # one latestOffset stride covers BOTH v1 (free) and v2 (1 file)
    assert r.latestOffset()["version"] == 2

    # CDF stream: an update commit costs its cdc file count, not adds
    pc = os.path.join(tmpdir_path, "cdfbudget")
    write_delta(
        spark.range(3).selectExpr("id").repartition(1),
        pc,
        options={"delta.enableChangeDataFeed": "true"},
    )
    tc = DeltaTable.forPath(spark, pc)
    tc.update("id = 1", {"id": "11"})  # v1: cdc file(s) + 1 add
    tc.delete("id = 2")  # v2: cdc + rewrite
    rc = JodieDeltaCdfStreamReader(
        {"path": pc, "startingVersion": "1", "maxFilesPerTrigger": "1"},
        _cdf_schema(tc.schema()),
    )
    rc.initialOffset()
    offs = [rc.latestOffset()["version"] for _ in range(3)]
    assert offs == [1, 2, 2]  # one cdc commit per trigger, then parked


def test_stream_legacy_bare_minus_one_offset_serves_snapshot(
    registered, tmpdir_path
):
    """ADVICE r9: checkpoints persisted BEFORE the explicit snapshot
    sentinel encode the default start as a bare {"version": -1}. On
    restart (no startingVersion option) that must keep meaning
    "snapshot first" — replaying commits 0..latest would raise on
    historical removes and re-read since-removed files. With
    startingVersion=0 set, the bare -1 correctly replays commit 0."""
    spark = registered
    out = os.path.join(tmpdir_path, "ds_legacy_off")
    write_delta(spark.range(10).repartition(1).selectExpr("id", "'a' as tag"), out)
    from jodie_spark.sources.datasource import JodieDeltaStreamReader

    t = DeltaTable.forPath(spark, out)
    t.delete("id < 5")  # historical remove: per-commit replay would raise
    latest = t.deltaLog.latest_version()

    # restart with a pre-sentinel checkpointed offset, default start
    reader = JodieDeltaStreamReader({"path": out}, t.schema())
    parts = reader.partitions({"version": -1}, {"version": latest})
    assert len(parts) >= 1  # snapshot served, no append-only error

    # explicit startingVersion=0 restart: same bare -1 replays commits,
    # so the historical remove still trips the append-only gate
    replay = JodieDeltaStreamReader(
        {"path": out, "startingVersion": "0"}, t.schema()
    )
    with pytest.raises(RuntimeError, match="append-only"):
        replay.partitions({"version": -1}, {"version": latest})

    # the explicit sentinel path is unchanged
    sent = JodieDeltaStreamReader({"path": out}, t.schema())
    parts2 = sent.partitions(
        {"version": -1, "snapshot": True}, {"version": latest}
    )
    assert {p.file_path for p in parts2} == {p.file_path for p in parts}


def test_batch_reader_packs_many_small_files(spark, tmpdir_path):
    """Above the packing threshold the batch reader serves MANY files
    per Spark task (a million-file table must not schedule a million
    tasks); below it the per-file plan — and its parallelism — is
    unchanged. Packing respects the byte/file caps and loses no rows."""
    from jodie_spark.sources.datasource import (
        _BATCH_MAX_FILES,
        _BATCH_TARGET_BYTES,
        _FileBatchPartition,
        _FilePartition,
        _pack_file_partitions,
    )

    fps = [_FilePartition(f"f{i}", {}) for i in range(5000)]
    # tiny files: packs to ceil(5000/_BATCH_MAX_FILES) batches
    packed = _pack_file_partitions(fps, [10] * 5000)
    assert all(isinstance(p, _FileBatchPartition) for p in packed)
    assert len(packed) == 5
    assert sum(len(p.files) for p in packed) == 5000
    assert [f.file_path for f in packed[0].files][:2] == ["f0", "f1"]  # order kept
    # big files: byte cap splits before the file cap
    big = _pack_file_partitions(fps, [_BATCH_TARGET_BYTES // 2 + 1] * 5000)
    assert all(len(p.files) == 1 for p in big[:10])
    # below the threshold: untouched per-file plan
    small = _pack_file_partitions(fps[:100], [10] * 100)
    assert small == fps[:100]

    # end-to-end: the filesPerTaskThreshold OPTION reaches the planning
    # worker (a module monkeypatch would not — partitions() runs in a
    # separate python process), so this genuinely reads through packed
    # _FileBatchPartition tasks and still returns exact rows
    import os

    from jodie_spark.sources.datasource import register
    from jodie_spark.tables.table import write_delta

    register(spark)
    p = os.path.join(tmpdir_path, "packed")
    write_delta(spark.range(200).selectExpr("id", "id % 7 as k").repartition(8), p)
    df = (
        spark.read.format("jodie_delta")
        .option("filesPerTaskThreshold", "4")  # force packing on 8 files
        .load(p)
    )
    assert df.count() == 200
    assert df.rdd.getNumPartitions() == 1  # 8 tiny files -> one packed task
    assert sorted(r["id"] for r in df.filter("k = 3").collect()) == list(range(3, 200, 7))


def test_cdf_batch_read_packs_change_files(spark, tmpdir_path):
    """A CDF replay over many change files packs into few tasks when
    forced below the threshold, with values identical to the per-file
    plan (the packed path must not reorder or drop change rows)."""
    import os

    from jodie_spark.sources.datasource import register
    from jodie_spark.tables.table import DeltaTable, write_delta

    register(spark)
    p = os.path.join(tmpdir_path, "cdfpack")
    write_delta(
        spark.createDataFrame([(i, i) for i in range(20)], ["k", "v"]).repartition(6),
        p,
        options={"delta.enableChangeDataFeed": "true"},
    )
    t = DeltaTable.forPath(spark, p)
    t.update("k < 5", {"v": "v + 100"})
    t.delete("k >= 18")

    def read(threshold=None):
        r = (
            spark.read.format("jodie_delta")
            .option("readChangeFeed", "true")
            .option("startingVersion", "0")
        )
        if threshold is not None:
            r = r.option("filesPerTaskThreshold", str(threshold))
        df = r.load(p)
        return df, sorted(
            (x["_change_type"], x["k"], x["_commit_version"]) for x in df.collect()
        )

    df_plain, plain = read()
    df_packed, packed = read(threshold=1)
    assert packed == plain and len(plain) == 32
    assert df_packed.rdd.getNumPartitions() < df_plain.rdd.getNumPartitions()
