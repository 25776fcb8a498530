"""UniForm-style Iceberg metadata generation + the Avro codec under it.

The verification is deliberately independent of the writer's in-memory
state: every file is re-read from disk through the schema-driven Avro
reader / json, the manifest's file set is compared against the Delta
log's live adds, and the listed parquet paths are re-read with pyarrow
to confirm an Iceberg-style reader would see exactly the table's rows.
"""

import json
import os

import pytest

from jodie_spark.errors import DeltaProtocolError
from jodie_spark.interop.avro import read_container, write_container
from jodie_spark.tables.table import DeltaTable, write_delta


def test_avro_container_roundtrip_all_types(tmpdir_path):
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "u", "type": ["null", "string"], "default": None},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "int"}},
            {
                "name": "rec",
                "type": ["null", {
                    "type": "record", "name": "inner",
                    "fields": [{"name": "x", "type": "long"}],
                }],
                "default": None,
            },
        ],
    }
    recs = [
        {"b": True, "i": -5, "l": 2**40, "f": 1.5, "d": -2.25, "s": "héllo",
         "by": b"\x00\xff", "u": None, "arr": [1, -2, 3], "m": {"k": 7},
         "rec": {"x": 9}},
        {"b": False, "i": 0, "l": -(2**40), "f": 0.0, "d": 0.0, "s": "",
         "by": b"", "u": "set", "arr": [], "m": {}, "rec": None},
    ]
    for codec in ("deflate", "null"):
        p = os.path.join(tmpdir_path, f"t_{codec}.avro")
        n = write_container(p, schema, recs, codec=codec)
        assert n == os.path.getsize(p)
        got_schema, got, meta = read_container(p)
        assert got == recs
        assert got_schema["name"] == "t"
        assert meta["avro.codec"].decode() == codec


def test_avro_negative_varints_and_empty_file(tmpdir_path):
    schema = {"type": "record", "name": "n",
              "fields": [{"name": "v", "type": "long"}]}
    vals = [0, -1, 1, -(2**62), 2**62, 63, -64]
    p = os.path.join(tmpdir_path, "n.avro")
    write_container(p, schema, [{"v": v} for v in vals])
    _, got, _ = read_container(p)
    assert [r["v"] for r in got] == vals
    p2 = os.path.join(tmpdir_path, "empty.avro")
    write_container(p2, schema, [])
    _, got2, _ = read_container(p2)
    assert got2 == []


def _read_metadata(table_path):
    meta_dir = os.path.join(table_path, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        v = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{v}.metadata.json")) as fh:
        return v, json.load(fh)


def test_iceberg_metadata_partitioned_table(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "ice")
    write_delta(
        spark.createDataFrame(
            [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "A")],
            "k int, v double, part string",
        ),
        p,
        partition_by=["part"],
    )
    t = DeltaTable.forPath(spark, p)
    meta_path = t.generate("iceberg")[0]
    v, md = _read_metadata(p)
    assert meta_path.endswith(f"v{v}.metadata.json")
    # spec-required metadata keys present and coherent
    assert md["format-version"] == 2
    assert md["current-schema-id"] == 0
    sch = md["schemas"][0]
    names = [f["name"] for f in sch["fields"]]
    assert names == ["k", "v", "part"]
    ids = [f["id"] for f in sch["fields"]]
    assert ids == [1, 2, 3] and md["last-column-id"] == 3
    spec = md["partition-specs"][0]["fields"]
    assert spec == [
        {"name": "part", "transform": "identity", "source-id": 3, "field-id": 1000}
    ]
    nm = json.loads(md["properties"]["schema.name-mapping.default"])
    assert {e["field-id"]: e["names"][0] for e in nm} == {1: "k", 2: "v", 3: "part"}

    # manifest list → manifest → data files, all re-read from disk
    snap_entry = md["snapshots"][0]
    assert snap_entry["snapshot-id"] == md["current-snapshot-id"]
    ml_path = snap_entry["manifest-list"][len("file://"):]
    _, manifests, _ = read_container(ml_path)
    assert len(manifests) == 1
    m = manifests[0]
    assert m["added_rows_count"] == 3 and m["added_files_count"] >= 2
    man_path = m["manifest_path"][len("file://"):]
    assert m["manifest_length"] == os.path.getsize(man_path)
    man_schema, entries, man_meta = read_container(man_path)
    assert man_meta["format-version"].decode() == "2"
    # field-ids embedded in the avro schema (what iceberg readers resolve by)
    df_fields = {f["name"]: f.get("field-id")
                 for f in man_schema["fields"][-1]["type"]["fields"]}
    assert df_fields["file_path"] == 100 and df_fields["record_count"] == 103

    live = {
        os.path.abspath(os.path.join(p, a["path"])) for a in t.snapshot().add_files()
    }
    listed = {e["data_file"]["file_path"][len("file://"):] for e in entries}
    assert listed == live
    # per-file typed partition values + record counts match the log's stats
    by_path = {
        os.path.abspath(os.path.join(p, a["path"])): a
        for a in t.snapshot().add_files()
    }
    total = 0
    for e in entries:
        d = e["data_file"]
        add = by_path[d["file_path"][len("file://"):]]
        assert d["partition"]["part"] == add["partitionValues"]["part"]
        assert d["record_count"] == json.loads(add["stats"])["numRecords"]
        assert d["file_size_in_bytes"] == add["size"]
        total += d["record_count"]
    assert total == 3

    # an Iceberg-style reader sees exactly the table's rows: re-read the
    # listed parquet paths with pyarrow (independent of Spark)
    import pyarrow.parquet as pq

    rows = []
    for e in entries:
        tbl = pq.read_table(e["data_file"]["file_path"][len("file://"):])
        part = e["data_file"]["partition"]["part"]
        rows += [(k, vv, part) for k, vv in
                 zip(tbl.column("k").to_pylist(), tbl.column("v").to_pylist())]
    assert sorted(rows) == [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "A")]


def test_iceberg_regeneration_tracks_dml_and_refusals(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "ice2")
    write_delta(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), p)
    t = DeltaTable.forPath(spark, p)
    t.generate("iceberg")
    v1, md1 = _read_metadata(p)
    # DML, then regenerate: version bumps, uuid stable, file set tracks
    t.delete("k = 1")
    DeltaTable.forPath(spark, p).generate("iceberg")
    v2, md2 = _read_metadata(p)
    assert v2 == v1 + 1
    assert md2["table-uuid"] == md1["table-uuid"]
    assert md2["last-sequence-number"] > md1["last-sequence-number"]
    # snapshot history ACCUMULATES (UniForm appends per conversion):
    # v2 carries v1's snapshot plus the new one, logs track both
    assert len(md2["snapshots"]) == len(md1["snapshots"]) + 1
    assert md1["snapshots"][0]["snapshot-id"] in {
        s_["snapshot-id"] for s_ in md2["snapshots"]
    }
    assert len(md2["snapshot-log"]) == 2
    assert md2["metadata-log"][-1]["metadata-file"].endswith(
        f"v{v1}.metadata.json"
    )
    cur = next(
        s_ for s_ in md2["snapshots"]
        if s_["snapshot-id"] == md2["current-snapshot-id"]
    )
    ml = cur["manifest-list"][len("file://"):]
    _, manifests, _ = read_container(ml)
    _, entries, _ = read_container(
        manifests[0]["manifest_path"][len("file://"):]
    )
    live = {
        os.path.abspath(os.path.join(p, a["path"]))
        for a in DeltaTable.forPath(spark, p).snapshot().add_files()
    }
    assert {e["data_file"]["file_path"][len("file://"):] for e in entries} == live

    # refusals: deletion vectors and column-mapped tables
    t2 = DeltaTable.forPath(spark, p)
    t2.delete("k = 2", deletion_vectors=True)
    with pytest.raises(DeltaProtocolError, match="deletion vectors"):
        DeltaTable.forPath(spark, p).generate("iceberg")

    p3 = os.path.join(tmpdir_path, "ice3")
    write_delta(spark.createDataFrame([(1, "a")], "k int, v string"), p3)
    t3 = DeltaTable.forPath(spark, p3)
    t3.rename_column("v", "val")  # auto-enables column mapping
    with pytest.raises(DeltaProtocolError, match="column-mapped"):
        DeltaTable.forPath(spark, p3).generate("iceberg")


def test_convert_iceberg_to_delta_roundtrip(spark, tmpdir_path):
    """Full circle: Delta table → Iceberg metadata → a NEW Delta log
    created purely FROM the Iceberg metadata (CONVERT TO DELTA
    iceberg.`path`, public delta-spark feature). The converted table
    must read back the same rows, carry the partition columns from the
    Iceberg spec, and keep per-file stats (pruning works)."""
    import shutil

    from jodie_spark import sql
    from jodie_spark.errors import JodieValidationError

    src = os.path.join(tmpdir_path, "csrc")
    write_delta(
        spark.createDataFrame(
            [(1, 10.5, "A"), (2, 20.5, "B"), (3, 30.5, "A"), (4, 40.5, "C")],
            "k int, v double, part string",
        ),
        src,
        partition_by=["part"],
    )
    t = DeltaTable.forPath(spark, src)
    t.delete("k = 2")
    t2 = DeltaTable.forPath(spark, src)
    t2.generate("iceberg")

    # clone the layout WITHOUT the delta log: an iceberg-only table
    dst = os.path.join(tmpdir_path, "cdst")
    shutil.copytree(src, dst, ignore=shutil.ignore_patterns("_delta_log"))
    # rewrite absolute URIs in the copied metadata to point at dst
    meta_dir = os.path.join(dst, "metadata")
    for name in os.listdir(meta_dir):
        p = os.path.join(meta_dir, name)
        if name.endswith((".json", ".avro")):
            with open(p, "rb") as fh:
                data = fh.read()
            with open(p, "wb") as fh:
                fh.write(data.replace(src.encode(), dst.encode()))

    sql(spark, f"CONVERT TO DELTA iceberg.`{dst}`")
    conv = DeltaTable.forPath(spark, dst)
    got = sorted(
        (r["k"], r["v"], r["part"]) for r in conv.toDF().collect()
    )
    assert got == [(1, 10.5, "A"), (3, 30.5, "A"), (4, 40.5, "C")]
    snap = conv.snapshot()
    assert snap.partition_columns == ["part"]
    # stats landed: every add has numRecords
    assert all(
        json.loads(a["stats"])["numRecords"] >= 1 for a in snap.add_files()
    )
    # partition pruning still works on the converted table
    assert conv.toDF().filter("part = 'A'").count() == 2
    # converting an existing Delta table refuses
    with pytest.raises(JodieValidationError, match="already"):
        sql(spark, f"CONVERT TO DELTA iceberg.`{src}`")
    # further DML on the converted table works
    conv.update("k = 1", {"v": "v + 1"})
    assert {r["k"]: r["v"] for r in DeltaTable.forPath(spark, dst).toDF().collect()}[1] == 11.5


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    recs=st.lists(
        st.fixed_dictionaries(
            {
                "s": st.text(max_size=40),
                "n": st.integers(min_value=-(2**62), max_value=2**62),
                "opt": st.one_of(st.none(), st.integers(-1000, 1000)),
                "arr": st.lists(st.integers(-100, 100), max_size=8),
                "m": st.dictionaries(
                    st.text(min_size=1, max_size=6), st.booleans(), max_size=4
                ),
            }
        ),
        max_size=12,
    ),
    codec=st.sampled_from(["null", "deflate"]),
)
def test_avro_property_roundtrip(recs, codec):
    """Property: any record list under this schema survives an
    object-container round trip byte-exactly, both codecs."""
    import tempfile

    schema = {
        "type": "record",
        "name": "p",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "n", "type": "long"},
            {"name": "opt", "type": ["null", "int"], "default": None},
            {"name": "arr", "type": {"type": "array", "items": "int"}},
            {"name": "m", "type": {"type": "map", "values": "boolean"}},
        ],
    }
    p = os.path.join(tempfile.mkdtemp(prefix="avro_prop_"), "prop.avro")
    write_container(p, schema, recs, codec=codec)
    _, got, _ = read_container(p)
    assert got == recs
