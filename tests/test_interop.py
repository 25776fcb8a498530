"""Ecosystem interop (VERDICT r3 task 2): foreign-shaped Delta logs →
this engine, and this engine's logs → a foreign minimal reader.

delta-spark cannot be installed here (no network — see
tests/interop_golden.py), so the foreign side is a from-scratch
mini writer/reader transcribed from PROTOCOL.md and shaped like real
delta-spark 3.x output. No jodie_spark code runs on the foreign side.
"""

import json
import os
import uuid

import pytest

from tests.interop_golden import (
    commit_info,
    foreign_read_rows,
    foreign_read_state,
    part_name,
    schema_string,
    serialize_dv,
    write_checkpoint,
    write_commit,
    write_dv,
    write_parquet,
)


def _meta(fields, partition_cols=None, configuration=None, metadata=None):
    return {
        "metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string(fields, metadata),
            "partitionColumns": partition_cols or [],
            "configuration": configuration or {},
            "createdTime": 1700000000000,
        }
    }


# ---------------------------------------------------------------------------
# foreign logs → jodie_spark
# ---------------------------------------------------------------------------


def test_reads_foreign_plain_table_with_history(spark, tmpdir_path):
    from jodie_spark.tables.table import DeltaTable

    t = os.path.join(tmpdir_path, "foreign_plain")
    f1 = part_name(0)
    f2 = part_name(1)
    a1 = write_parquet(t, f1, {"id": [1, 2, 3], "v": ["a", "b", "c"]})
    a2 = write_parquet(t, f2, {"id": [4, 5], "v": ["d", "e"]})
    write_commit(
        t,
        0,
        [
            commit_info("WRITE", {"mode": "ErrorIfExists", "partitionBy": "[]"}),
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta([("id", "long"), ("v", "string")]),
            {"add": a1},
        ],
    )
    write_commit(
        t, 1, [commit_info("WRITE", {"mode": "Append", "partitionBy": "[]"}), {"add": a2}]
    )
    # v2: delta-spark-style DELETE — remove f1, re-add the survivors
    f3 = part_name(0)
    a3 = write_parquet(t, f3, {"id": [2, 3], "v": ["b", "c"]})
    write_commit(
        t,
        2,
        [
            commit_info("DELETE", {"predicate": '["(id = 1)"]'}),
            {"remove": {"path": f1, "deletionTimestamp": 1700000001000, "dataChange": True}},
            {"add": a3},
        ],
    )

    # v3: delta-spark-style UPDATE — remove f3, re-add with the change
    # (completes the golden `basic` shape: DELETE and UPDATE both in
    # history, r12)
    f4 = part_name(0)
    a4 = write_parquet(t, f4, {"id": [2, 3], "v": ["B!", "c"]})
    write_commit(
        t,
        3,
        [
            commit_info("UPDATE", {"predicate": "(id = 2)"}),
            {"remove": {"path": f3, "deletionTimestamp": 1700000002000, "dataChange": True}},
            {"add": a4},
        ],
    )

    table = DeltaTable.forPath(spark, t)
    rows = sorted((r["id"], r["v"]) for r in table.toDF().collect())
    assert rows == [(2, "B!"), (3, "c"), (4, "d"), (5, "e")]
    # time travel to every version
    assert sorted(r["id"] for r in table.toDF(version=0).collect()) == [1, 2, 3]
    assert sorted(r["id"] for r in table.toDF(version=1).collect()) == [1, 2, 3, 4, 5]
    assert sorted((r["id"], r["v"]) for r in table.toDF(version=2).collect()) == [
        (2, "b"), (3, "c"), (4, "d"), (5, "e")
    ]
    hist = [r["operation"] for r in table.history().collect()]
    assert hist == ["UPDATE", "DELETE", "WRITE", "WRITE"]


def test_reads_foreign_partitioned_table_with_pruning(spark, tmpdir_path):
    from jodie_spark.tables.table import DeltaTable

    t = os.path.join(tmpdir_path, "foreign_part")
    adds = []
    for day, ids in (("2024-01-01", [1, 2]), ("2024-01-02", [3]), ("2024-01-03", [4, 5])):
        rel = f"day={day}/{part_name()}"
        a = write_parquet(t, rel, {"id": ids})
        a["partitionValues"] = {"day": day}
        adds.append(a)
    write_commit(
        t,
        0,
        [
            commit_info("WRITE", {"mode": "ErrorIfExists", "partitionBy": '["day"]'}),
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta([("id", "long"), ("day", "string")], partition_cols=["day"]),
        ]
        + [{"add": a} for a in adds],
    )
    table = DeltaTable.forPath(spark, t)
    rows = sorted((r["id"], r["day"]) for r in table.toDF().collect())
    assert [r[0] for r in rows] == [1, 2, 3, 4, 5]
    got = sorted(
        r["id"] for r in table.toDF().filter("day = '2024-01-02'").collect()
    )
    assert got == [3]
    # our DML on the foreign table: partition-pruned delete
    table.delete("day = '2024-01-03'")
    left = sorted(r["id"] for r in DeltaTable.forPath(spark, t).toDF().collect())
    assert left == [1, 2, 3]


def test_reads_foreign_dv_table_and_purges_it(spark, tmpdir_path):
    """'u'-storage deletion vector with a path prefix, serialized by
    the independent encoder — rows must be masked, and REORG PURGE must
    rewrite the file clean."""
    from jodie_spark.tables.table import DeltaTable

    t = os.path.join(tmpdir_path, "foreign_dv")
    f1 = part_name()
    a1 = write_parquet(t, f1, {"id": list(range(10)), "v": [f"x{i}" for i in range(10)]})
    write_commit(
        t,
        0,
        [
            commit_info("WRITE", {"mode": "ErrorIfExists", "partitionBy": "[]"}),
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors"],
                    "writerFeatures": ["deletionVectors"],
                }
            },
            _meta([("id", "long"), ("v", "string")]),
            {"add": a1},
        ],
    )
    desc = write_dv(t, [1, 3, 5], prefix="ab")
    a1_dv = dict(a1, deletionVector=desc, dataChange=False)
    write_commit(
        t,
        1,
        [
            commit_info("DELETE", {"predicate": '["(id % 2 = 1)"]'}),
            {"remove": {"path": f1, "deletionTimestamp": 1700000002000, "dataChange": True}},
            {"add": a1_dv},
        ],
    )
    table = DeltaTable.forPath(spark, t)
    assert sorted(r["id"] for r in table.toDF().collect()) == [0, 2, 4, 6, 7, 8, 9]
    # purge: materialize the deletes into a clean file
    n = table.reorg_purge()
    assert n == 1
    t2 = DeltaTable.forPath(spark, t)
    assert sorted(r["id"] for r in t2.toDF().collect()) == [0, 2, 4, 6, 7, 8, 9]
    assert not any(a.get("deletionVector") for a in t2.snapshot().add_files())


def test_reads_foreign_column_mapped_table(spark, tmpdir_path):
    """Legacy reader2/writer5 column mapping: physical uuid column
    names in the files, logical names in the schema metadata."""
    from jodie_spark.tables.table import DeltaTable

    t = os.path.join(tmpdir_path, "foreign_cm")
    phys_id = f"col-{uuid.uuid4()}"
    phys_v = f"col-{uuid.uuid4()}"
    f1 = part_name()
    a1 = write_parquet(t, f1, {phys_id: [1, 2], phys_v: ["a", "b"]})
    md = {
        "id": {
            "delta.columnMapping.id": 1,
            "delta.columnMapping.physicalName": phys_id,
        },
        "v": {
            "delta.columnMapping.id": 2,
            "delta.columnMapping.physicalName": phys_v,
        },
    }
    write_commit(
        t,
        0,
        [
            commit_info("WRITE", {"mode": "ErrorIfExists", "partitionBy": "[]"}),
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _meta(
                [("id", "long"), ("v", "string")],
                configuration={
                    "delta.columnMapping.mode": "name",
                    "delta.columnMapping.maxColumnId": "2",
                },
                metadata=md,
            ),
        ]
        + [{"add": a1}],
    )
    df = DeltaTable.forPath(spark, t).toDF()
    assert [f.name for f in df.schema.fields] == ["id", "v"]
    assert sorted((r["id"], r["v"]) for r in df.collect()) == [(1, "a"), (2, "b")]
    # our DML committed on top of the foreign column-mapped table: the
    # rewrite must keep writing the PHYSICAL names delta-spark chose
    table = DeltaTable.forPath(spark, t)
    table.update("id = 2", {"v": "'bb'"})
    table.delete("id = 1")
    got = [(r["id"], r["v"]) for r in DeltaTable.forPath(spark, t).toDF().collect()]
    assert got == [(2, "bb")]
    state = foreign_read_state(t)
    import pyarrow.parquet as _pq

    for rel in state["files"]:
        names = set(_pq.read_schema(os.path.join(t, rel)).names)
        assert phys_id in names and phys_v in names, (
            f"rewritten file {rel} lost the foreign physical names: {names}"
        )


def test_reads_foreign_percent_encoded_partition_paths(spark, tmpdir_path):
    """delta-spark Hive-escapes special characters in partition DIRECTORY
    names ('c/d' → 'c%2Fd'; spaces stay literal) and then RFC3986-encodes
    the relative path it records in the log ('k=a b/…' → 'k=a%20b/…',
    the literal '%' of the escaped dir → '%25'), while partitionValues
    carries the RAW string. Spec-transcribed from PROTOCOL.md (add.path:
    'relative path … as a RFC 2396 URI') + Spark's
    ExternalCatalogUtils.escapePathName; same shape as the 'partitioned'
    golden fixture (tests/test_golden_fixtures.py). Our reader must
    decode to locate files; our DML on top must keep the table
    consistent for a foreign replayer."""
    from jodie_spark.tables.table import DeltaTable

    t = os.path.join(tmpdir_path, "foreign_pct")
    adds = []
    for disk_dir, raw, ids in (
        ("k=a b", "a b", [1, 3]),
        ("k=c%2Fd", "c/d", [2]),
    ):
        rel = f"{disk_dir}/{part_name()}"
        a = write_parquet(t, rel, {"id": ids})
        a["partitionValues"] = {"k": raw}
        # the log records the RFC3986-encoded relative path
        a["path"] = rel.replace("%", "%25").replace(" ", "%20")
        adds.append(a)
    write_commit(
        t,
        0,
        [
            commit_info("WRITE", {"mode": "ErrorIfExists", "partitionBy": '["k"]'}),
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta([("id", "long"), ("k", "string")], partition_cols=["k"]),
        ]
        + [{"add": a} for a in adds],
    )
    table = DeltaTable.forPath(spark, t)
    got = sorted((r["id"], r["k"]) for r in table.toDF().collect())
    assert got == [(1, "a b"), (2, "c/d"), (3, "a b")]
    # partition pruning must compare the RAW value, not the encoding
    assert sorted(
        r["id"] for r in table.toDF().filter("k = 'a b'").collect()
    ) == [1, 3]
    assert [r["id"] for r in table.toDF().filter("k = 'c/d'").collect()] == [2]
    # our DML on top: drop the slash partition, then verify both our
    # reader and the independent foreign replayer agree on the result
    table.delete("k = 'c/d'")
    left = sorted((r["id"], r["k"]) for r in DeltaTable.forPath(spark, t).toDF().collect())
    assert left == [(1, "a b"), (3, "a b")]
    state = foreign_read_state(t)
    live = set(state["files"])
    assert adds[0]["path"] in live, "our remove must reference the encoded add path"
    assert adds[1]["path"] not in live


def test_reads_foreign_checkpointed_table_without_early_jsons(spark, tmpdir_path):
    """Classic checkpoint + _last_checkpoint written by the foreign
    writer; pre-checkpoint commit JSONs deleted (metadata cleanup) —
    state must come from the checkpoint plus the JSON tail."""
    from jodie_spark.tables.table import DeltaTable

    t = os.path.join(tmpdir_path, "foreign_cp")
    meta = _meta([("id", "long")])
    proto = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
    adds = []
    for v in range(4):
        a = write_parquet(t, part_name(v), {"id": [v * 10, v * 10 + 1]})
        adds.append(a)
        acts = [commit_info("WRITE", {"mode": "Append", "partitionBy": "[]"}), {"add": a}]
        if v == 0:
            acts = [acts[0], proto, meta, acts[1]]
        write_commit(t, v, acts)
    # checkpoint at v2 covers adds 0..2
    write_checkpoint(
        t, 2, [proto, meta] + [{"add": a} for a in adds[:3]]
    )
    # simulate log cleanup of v0..v2
    for v in range(3):
        os.remove(os.path.join(t, "_delta_log", f"{v:020d}.json"))
    table = DeltaTable.forPath(spark, t)
    ids = sorted(r["id"] for r in table.toDF().collect())
    assert ids == [0, 1, 10, 11, 20, 21, 30, 31]


def test_reads_foreign_ict_table_history_and_time_travel(spark, tmpdir_path):
    """Foreign-written in-commit timestamps (delta-spark 3.3+ default):
    history() and timestampAsOf must use the monotonic ICT values from
    commitInfo, not file modification times — the fixture's ICTs are
    deliberately far from the files' real mtimes."""
    from jodie_spark.tables.table import DeltaTable

    t = os.path.join(tmpdir_path, "foreign_ict")
    proto = {
        "protocol": {
            "minReaderVersion": 1,
            "minWriterVersion": 7,
            "writerFeatures": ["inCommitTimestamp"],
        }
    }
    meta = _meta(
        [("id", "long")],
        configuration={"delta.enableInCommitTimestamps": "true"},
    )
    ict0, ict1 = 1600000000000, 1600000600000  # year 2020 — nowhere near mtime
    a0 = write_parquet(t, part_name(0), {"id": [1, 2]})
    a1 = write_parquet(t, part_name(1), {"id": [3]})
    ci0 = commit_info("WRITE", {"mode": "ErrorIfExists", "partitionBy": "[]"})
    ci0["commitInfo"]["inCommitTimestamp"] = ict0
    ci1 = commit_info("WRITE", {"mode": "Append", "partitionBy": "[]"})
    ci1["commitInfo"]["inCommitTimestamp"] = ict1
    write_commit(t, 0, [ci0, proto, meta, {"add": a0}])
    write_commit(t, 1, [ci1, {"add": a1}])

    table = DeltaTable.forPath(spark, t)
    hist = {r["version"]: r["timestamp"] for r in table.history().collect()}
    assert int(hist[0].timestamp() * 1000) == ict0
    assert int(hist[1].timestamp() * 1000) == ict1
    # timestampAsOf between the two ICTs resolves to v0
    import datetime as dt

    mid = dt.datetime.fromtimestamp((ict0 + 300_000) / 1000, tz=dt.timezone.utc)
    assert sorted(r["id"] for r in table.toDF(timestamp=mid).collect()) == [1, 2]
    assert sorted(r["id"] for r in table.toDF().collect()) == [1, 2, 3]


def test_reads_foreign_row_tracking_table_with_lineage(spark, tmpdir_path):
    """Foreign-written row tracking: baseRowId/defaultRowCommitVersion
    on the adds + the delta.rowTracking high-watermark domain. The
    withRowIds read must materialize _row_id = baseRowId + position and
    _row_commit_version from the foreign metadata."""
    from jodie_spark.sources.datasource import register
    from jodie_spark.tables.table import DeltaTable

    t = os.path.join(tmpdir_path, "foreign_rt")
    proto = {
        "protocol": {
            "minReaderVersion": 1,
            "minWriterVersion": 7,
            "writerFeatures": ["rowTracking", "domainMetadata"],
        }
    }
    meta = _meta(
        [("id", "long")], configuration={"delta.enableRowTracking": "true"}
    )
    a0 = write_parquet(t, part_name(0), {"id": [10, 11, 12]})
    a0.update(baseRowId=0, defaultRowCommitVersion=0)
    a1 = write_parquet(t, part_name(1), {"id": [13, 14]})
    a1.update(baseRowId=3, defaultRowCommitVersion=1)
    write_commit(
        t,
        0,
        [
            commit_info("WRITE", {"mode": "ErrorIfExists", "partitionBy": "[]"}),
            proto,
            meta,
            {"add": a0},
            {
                "domainMetadata": {
                    "domain": "delta.rowTracking",
                    "configuration": json.dumps({"rowIdHighWaterMark": 2}),
                    "removed": False,
                }
            },
        ],
    )
    write_commit(
        t,
        1,
        [
            commit_info("WRITE", {"mode": "Append", "partitionBy": "[]"}),
            {"add": a1},
            {
                "domainMetadata": {
                    "domain": "delta.rowTracking",
                    "configuration": json.dumps({"rowIdHighWaterMark": 4}),
                    "removed": False,
                }
            },
        ],
    )
    register(spark)
    df = spark.read.format("jodie_delta").option("withRowIds", "true").load(t)
    rows = sorted(
        (r["_row_id"], r["id"], r["_row_commit_version"]) for r in df.collect()
    )
    assert rows == [
        (0, 10, 0), (1, 11, 0), (2, 12, 0), (3, 13, 1), (4, 14, 1)
    ]
    # and our engine continues the watermark: an append allocates 5+
    from jodie_spark.tables.table import write_delta

    write_delta(spark.createDataFrame([(15,)], "id long"), t, mode="append")
    df2 = spark.read.format("jodie_delta").option("withRowIds", "true").load(t)
    got = {r["id"]: r["_row_id"] for r in df2.collect()}
    assert got[15] == 5
    assert DeltaTable.forPath(spark, t)  # still a readable table


def test_reads_foreign_v2_checkpoint_manifest_with_sidecars(spark, tmpdir_path):
    """From-scratch foreign v2 checkpoint: uuid-named parquet manifest
    holding protocol/metaData/checkpointMetadata/sidecar rows, adds
    split across TWO sidecar files under _delta_log/_sidecars/,
    _last_checkpoint pointing at it, and the pre-checkpoint JSONs
    deleted — state must reconstruct from the manifest + JSON tail."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jodie_spark.tables.table import DeltaTable

    t = os.path.join(tmpdir_path, "foreign_v2cp")
    log_dir = os.path.join(t, "_delta_log")
    proto = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["v2Checkpoint"],
        "writerFeatures": ["v2Checkpoint"],
    }
    meta_action = _meta([("id", "long")])["metaData"]
    adds = []
    for v in range(3):
        a = write_parquet(t, part_name(v), {"id": [v * 10, v * 10 + 1]})
        acts = [commit_info("WRITE", {"mode": "Append", "partitionBy": "[]"})]
        if v == 0:
            acts += [{"protocol": proto}, {"metaData": meta_action}]
        acts.append({"add": a})
        write_commit(t, v, acts)
        adds.append(a)
    # v2 checkpoint at version 2, adds split across two sidecars
    str_map = pa.map_(pa.string(), pa.string())
    add_t = pa.struct(
        [("path", pa.string()), ("partitionValues", str_map), ("size", pa.int64()),
         ("modificationTime", pa.int64()), ("dataChange", pa.bool_()),
         ("stats", pa.string())]
    )
    sidecar_dir = os.path.join(log_dir, "_sidecars")
    os.makedirs(sidecar_dir)
    side_names = []
    for chunk in (adds[:2], adds[2:]):
        nm = f"{uuid.uuid4()}.parquet"
        rows = [
            {"add": {"path": a["path"], "partitionValues": {}, "size": a["size"],
                     "modificationTime": 0, "dataChange": False, "stats": None}}
            for a in chunk
        ]
        pq.write_table(
            pa.Table.from_pylist(rows, schema=pa.schema([("add", add_t)])),
            os.path.join(sidecar_dir, nm),
        )
        side_names.append(nm)
    meta_t = pa.struct(
        [("id", pa.string()),
         ("format", pa.struct([("provider", pa.string()), ("options", str_map)])),
         ("schemaString", pa.string()), ("partitionColumns", pa.list_(pa.string())),
         ("configuration", str_map), ("createdTime", pa.int64())]
    )
    proto_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32()),
         ("readerFeatures", pa.list_(pa.string())), ("writerFeatures", pa.list_(pa.string()))]
    )
    manifest_rows = [
        {"protocol": proto},
        {"metaData": meta_action},
        {"checkpointMetadata": {"version": 2}},
    ] + [
        {"sidecar": {"path": nm,
                     "sizeInBytes": os.path.getsize(os.path.join(sidecar_dir, nm)),
                     "modificationTime": 0}}
        for nm in side_names
    ]
    schema = pa.schema(
        [("protocol", proto_t), ("metaData", meta_t),
         ("checkpointMetadata", pa.struct([("version", pa.int64())])),
         ("sidecar", pa.struct([("path", pa.string()), ("sizeInBytes", pa.int64()),
                                ("modificationTime", pa.int64())]))]
    )
    pq.write_table(
        pa.Table.from_pylist(manifest_rows, schema=schema),
        os.path.join(log_dir, f"{2:020d}.checkpoint.{uuid.uuid4()}.parquet"),
    )
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        fh.write(json.dumps({"version": 2}))
    for v in range(3):
        os.remove(os.path.join(log_dir, f"{v:020d}.json"))
    # a post-checkpoint JSON commit must still replay on top
    a3 = write_parquet(t, part_name(3), {"id": [30, 31]})
    write_commit(
        t, 3, [commit_info("WRITE", {"mode": "Append", "partitionBy": "[]"}), {"add": a3}]
    )
    table = DeltaTable.forPath(spark, t)
    ids = sorted(r["id"] for r in table.toDF().collect())
    assert ids == [0, 1, 10, 11, 20, 21, 30, 31]


def test_reads_foreign_cdf_table(spark, tmpdir_path):
    """Foreign-written Change Data Feed: a cdc action under
    _change_data/ for an UPDATE plus plain adds for the initial WRITE —
    read_cdf must synthesize v0 inserts from the add and surface the
    foreign cdc rows verbatim (ChangeDataFeedHelper operates on
    arbitrary existing tables)."""
    from jodie_spark.operators.cdf import read_cdf

    t = os.path.join(tmpdir_path, "foreign_cdf")
    meta = _meta(
        [("id", "long"), ("v", "string")],
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    f1 = part_name(0)
    a1 = write_parquet(t, f1, {"id": [1, 2], "v": ["a", "b"]})
    write_commit(
        t,
        0,
        [
            commit_info("WRITE", {"mode": "ErrorIfExists", "partitionBy": "[]"}),
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
            meta,
            {"add": a1},
        ],
    )
    # v1: UPDATE id=2 → v='B' with foreign-written cdc file
    f2 = part_name(1)
    a2 = write_parquet(t, f2, {"id": [1, 2], "v": ["a", "B"]})
    cdc_rel = f"_change_data/{part_name(9)}"
    cdc_add = write_parquet(
        t,
        cdc_rel,
        {
            "id": [2, 2],
            "v": ["b", "B"],
            "_change_type": ["update_preimage", "update_postimage"],
        },
    )
    write_commit(
        t,
        1,
        [
            commit_info("UPDATE", {"predicate": "(id = 2)"}),
            {"remove": {"path": f1, "deletionTimestamp": 1700000003000, "dataChange": True}},
            {"add": a2},
            {"cdc": {"path": cdc_rel, "partitionValues": {}, "size": cdc_add["size"],
                     "dataChange": False}},
        ],
    )
    changes = read_cdf(spark, t, starting_version=0, ending_version=1)
    got = sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in changes.collect()
    )
    assert got == [
        (0, "insert", 1, "a"),
        (0, "insert", 2, "b"),
        (1, "update_postimage", 2, "B"),
        (1, "update_preimage", 2, "b"),
    ]


def test_foreign_add_tags_survive_our_checkpoint(spark, tmpdir_path):
    """add.tags is optional protocol metadata foreign writers rely on
    (delta-spark's clustering ZCUBEs, backfill markers): our snapshot
    must surface it and our checkpoint writers must not drop it."""
    from jodie_spark.tables.log import DeltaLog
    from jodie_spark.tables.table import DeltaTable

    t = os.path.join(tmpdir_path, "foreign_tags")
    a0 = write_parquet(t, part_name(0), {"id": [1, 2]})
    a0["tags"] = {"ZCUBE_ID": "foreign-zcube-1", "custom": "x"}
    a1 = write_parquet(t, part_name(1), {"id": [3]})
    write_commit(
        t,
        0,
        [
            commit_info("WRITE", {"mode": "ErrorIfExists", "partitionBy": "[]"}),
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta([("id", "long")]),
            {"add": a0},
            {"add": a1},
        ],
    )
    log = DeltaLog(t)

    def tags_by_path():
        return {
            a["path"]: (a.get("tags") or None)
            for a in log.snapshot().add_files()
        }

    before = tags_by_path()
    assert before[a0["path"]] == {"ZCUBE_ID": "foreign-zcube-1", "custom": "x"}
    assert before[a1["path"]] is None
    # roundtrip through BOTH checkpoint writers, dropping the JSON tail
    for spark_side in (False, True):
        log.write_checkpoint(spark=spark if spark_side else None)
        assert tags_by_path() == before
    # and a post-checkpoint commit by our engine keeps reading them
    from jodie_spark.tables.table import write_delta

    write_delta(spark.createDataFrame([(9,)], "id long"), t, mode="append")
    after = {
        a["path"]: (a.get("tags") or None)
        for a in DeltaTable.forPath(spark, t).snapshot().add_files()
    }
    assert after[a0["path"]] == before[a0["path"]]


# ---------------------------------------------------------------------------
# jodie_spark → foreign reader
# ---------------------------------------------------------------------------


def test_foreign_reader_parses_our_writes_and_dml(spark, tmpdir_path):
    """Tables this engine writes must reconstruct correctly from the
    raw log with ZERO jodie_spark code — append, delete, update,
    optimize, checkpoint."""
    from jodie_spark.tables.table import DeltaTable, write_delta

    t = os.path.join(tmpdir_path, "ours_foreign")
    write_delta(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(8)], "id long, v string"
        ).repartition(2),
        t,
    )
    table = DeltaTable.forPath(spark, t)
    table.delete("id >= 6")
    table.update("id = 0", {"v": "'zero'"})
    table.optimize().executeCompaction()
    table.deltaLog.write_checkpoint()

    state = foreign_read_state(t)
    assert state["protocol"]["minWriterVersion"] >= 2
    assert json.loads(state["metadata"]["schemaString"])["fields"][0]["name"] == "id"
    rows = foreign_read_rows(t, ["id", "v"])
    assert rows == [
        (0, "zero"), (1, "v1"), (2, "v2"), (3, "v3"), (4, "v4"), (5, "v5")
    ]


def test_foreign_reader_parses_our_partitioned_writes(spark, tmpdir_path):
    from jodie_spark.tables.table import write_delta

    t = os.path.join(tmpdir_path, "ours_part")
    write_delta(
        spark.createDataFrame(
            [(1, "x"), (2, "x"), (3, "y")], "id long, grp string"
        ),
        t,
        partition_by=["grp"],
    )
    state = foreign_read_state(t)
    assert state["metadata"]["partitionColumns"] == ["grp"]
    assert all(
        ("grp=" in p) for p in state["files"]
    ), list(state["files"])
    rows = foreign_read_rows(t, ["id", "grp"])
    assert rows == [(1, "x"), (2, "x"), (3, "y")]


def test_independent_dv_serializers_agree(spark):
    """Byte-level cross-check: the test-side encoder and the engine's
    parser/serializer agree on the portable roaring format."""
    from jodie_spark.tables.deletion_vectors import (
        parse_roaring_bitmap_array,
        serialize_roaring_bitmap_array,
    )

    cases = [
        [],
        [0],
        [1, 3, 5],
        list(range(100)),
        [0, 65535, 65536, 131072, 2**32, 2**32 + 7],
        [i * 7 for i in range(5000)],
    ]
    for positions in cases:
        foreign = serialize_dv(positions)
        assert parse_roaring_bitmap_array(foreign) == sorted(positions)
        ours = serialize_roaring_bitmap_array(sorted(positions))
        assert parse_roaring_bitmap_array(ours) == sorted(positions)


def test_reads_foreign_combo_dv_cmapid_v2cp_ict(spark, tmpdir_path):
    """The one-log combination the delta-spark golden lane targets
    (tests/test_golden_fixtures.py::test_combo_dv_cmapid_v2cp_ict),
    spec-transcribed here since delta-spark cannot run in-sandbox:
    column mapping mode=id (parquet names deliberately mismatched,
    only field ids line up) + a logical RENAME + a 'u'-storage
    deletion vector + a v2 checkpoint with sidecars (pre-checkpoint
    JSONs deleted) + monotonic inCommitTimestamps — one foreign log,
    every feature interacting. Then our own DML commits on top."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jodie_spark.tables.table import DeltaTable

    t = os.path.join(tmpdir_path, "foreign_combo")
    log_dir = os.path.join(t, "_delta_log")
    os.makedirs(log_dir)

    def fid(name, typ, i):
        return pa.field(name, typ, metadata={b"PARQUET:field_id": str(i).encode()})

    arrow_schema = pa.schema([fid("zz_one", pa.int64(), 1), fid("zz_two", pa.int64(), 2)])

    def fid_parquet(rel, ids):
        tbl = pa.table(
            {"zz_one": pa.array(ids, pa.int64()),
             "zz_two": pa.array([i * 10 for i in ids], pa.int64())},
            schema=arrow_schema,
        )
        pq.write_table(tbl, os.path.join(t, rel))
        return {
            "path": rel,
            "partitionValues": {},
            "size": os.path.getsize(os.path.join(t, rel)),
            "modificationTime": 0,
            "dataChange": True,
        }

    def fmeta(cid, phys):
        return {"delta.columnMapping.id": cid,
                "delta.columnMapping.physicalName": phys}

    def cm_schema(v_logical):
        return json.dumps({
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": fmeta(1, "col-aa")},
                {"name": v_logical, "type": "long", "nullable": True,
                 "metadata": fmeta(2, "col-bb")},
            ],
        })

    def meta_action(v_logical):
        return {
            "id": "combo1",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": cm_schema(v_logical),
            "partitionColumns": [],
            "configuration": {
                "delta.columnMapping.mode": "id",
                "delta.columnMapping.maxColumnId": "2",
                "delta.enableInCommitTimestamps": "true",
            },
            "createdTime": 1700000000000,
        }

    proto = {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["columnMapping", "deletionVectors", "v2Checkpoint"],
        "writerFeatures": ["columnMapping", "deletionVectors", "v2Checkpoint",
                           "inCommitTimestamp"],
    }

    def ict_ci(op, ts):
        return {"commitInfo": {"operation": op, "operationParameters": {},
                               "timestamp": ts, "inCommitTimestamp": ts,
                               "engineInfo": "foreign-writer"}}

    a1 = fid_parquet("part-a.parquet", [0, 1, 2, 3, 4])
    a2 = fid_parquet("part-b.parquet", [5, 6, 7])
    write_commit(t, 0, [ict_ci("WRITE", 1700000001000),
                        {"protocol": proto}, {"metaData": meta_action("v")},
                        {"add": a1}, {"add": a2}])
    # v1: logical rename v -> val (physical col-bb unchanged)
    write_commit(t, 1, [ict_ci("RENAME COLUMN", 1700000002000),
                        {"metaData": meta_action("val")}])
    # v2: DV delete of id=3 (row position 3 of part-a)
    desc = write_dv(t, [3], prefix="ab")
    a1_dv = dict(a1, deletionVector=desc, dataChange=False)
    write_commit(t, 2, [ict_ci("DELETE", 1700000003000),
                        {"remove": {"path": a1["path"],
                                    "deletionTimestamp": 1700000003000,
                                    "dataChange": True}},
                        {"add": a1_dv}])

    # v2 CHECKPOINT at version 2: manifest + two sidecars, then the
    # covered JSONs deleted — state must reconstruct from the manifest
    str_map = pa.map_(pa.string(), pa.string())
    dv_t = pa.struct([
        ("storageType", pa.string()), ("pathOrInlineDv", pa.string()),
        ("offset", pa.int32()), ("sizeInBytes", pa.int32()),
        ("cardinality", pa.int64()),
    ])
    add_t = pa.struct([
        ("path", pa.string()), ("partitionValues", str_map),
        ("size", pa.int64()), ("modificationTime", pa.int64()),
        ("dataChange", pa.bool_()), ("stats", pa.string()),
        ("deletionVector", dv_t),
    ])
    sidecar_dir = os.path.join(log_dir, "_sidecars")
    os.makedirs(sidecar_dir)
    side_names = []
    for chunk in ([a1_dv], [a2]):
        nm = f"{uuid.uuid4()}.parquet"
        rows = [{"add": {
            "path": a["path"], "partitionValues": {}, "size": a["size"],
            "modificationTime": 0, "dataChange": False, "stats": None,
            "deletionVector": a.get("deletionVector"),
        }} for a in chunk]
        pq.write_table(
            pa.Table.from_pylist(rows, schema=pa.schema([("add", add_t)])),
            os.path.join(sidecar_dir, nm),
        )
        side_names.append(nm)
    meta_t = pa.struct([
        ("id", pa.string()),
        ("format", pa.struct([("provider", pa.string()), ("options", str_map)])),
        ("schemaString", pa.string()), ("partitionColumns", pa.list_(pa.string())),
        ("configuration", str_map), ("createdTime", pa.int64()),
    ])
    proto_t = pa.struct([
        ("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32()),
        ("readerFeatures", pa.list_(pa.string())),
        ("writerFeatures", pa.list_(pa.string())),
    ])
    manifest_rows = [
        {"protocol": proto},
        {"metaData": meta_action("val")},
        {"checkpointMetadata": {"version": 2}},
    ] + [{"sidecar": {"path": nm,
                      "sizeInBytes": os.path.getsize(os.path.join(sidecar_dir, nm)),
                      "modificationTime": 0}} for nm in side_names]
    manifest_schema = pa.schema([
        ("protocol", proto_t), ("metaData", meta_t),
        ("checkpointMetadata", pa.struct([("version", pa.int64())])),
        ("sidecar", pa.struct([("path", pa.string()), ("sizeInBytes", pa.int64()),
                               ("modificationTime", pa.int64())])),
    ])
    pq.write_table(
        pa.Table.from_pylist(manifest_rows, schema=manifest_schema),
        os.path.join(log_dir, f"{2:020d}.checkpoint.{uuid.uuid4()}.parquet"),
    )
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        fh.write(json.dumps({"version": 2}))
    for v in range(3):
        os.remove(os.path.join(log_dir, f"{v:020d}.json"))

    # v3: post-rename, post-checkpoint foreign append
    a3 = fid_parquet("part-c.parquet", [8])
    write_commit(t, 3, [ict_ci("WRITE", 1700000004000), {"add": a3}])

    table = DeltaTable.forPath(spark, t)
    df = table.toDF()
    assert "val" in df.columns and "v" not in df.columns  # rename visible
    got = {r["id"]: r["val"] for r in df.collect()}
    assert 3 not in got           # DV-deleted through the v2cp sidecar
    assert got[8] == 80           # post-rename append
    assert len(got) == 8
    # ICT history: non-decreasing oldest-first (only the JSON tail
    # survives log cleanup, delta parity)
    ts = [r["timestamp"] for r in table.history().collect()][::-1]
    assert ts == sorted(ts)

    # and OUR engine can commit DML on top of the foreign combo state
    table.delete("id = 0")
    got2 = {r["id"]: r["val"] for r in DeltaTable.forPath(spark, t).toDF().collect()}
    assert 0 not in got2 and len(got2) == 7 and got2[8] == 80
