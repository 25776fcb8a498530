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

    table = DeltaTable.forPath(spark, t)
    rows = sorted((r["id"], r["v"]) for r in table.toDF().collect())
    assert rows == [(2, "b"), (3, "c"), (4, "d"), (5, "e")]
    # time travel to every version
    assert sorted(r["id"] for r in table.toDF(version=0).collect()) == [1, 2, 3]
    assert sorted(r["id"] for r in table.toDF(version=1).collect()) == [1, 2, 3, 4, 5]
    hist = [r["operation"] for r in table.history().collect()]
    assert hist == ["DELETE", "WRITE", "WRITE"]


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
