"""Type widening (append with mergeSchema) + write-time type safety."""

import os

import pytest

from jodie_spark.errors import JodieValidationError
from jodie_spark.tables.table import DeltaTable, write_delta


def test_incompatible_append_fails_at_write_time(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "t")
    write_delta(spark.createDataFrame([(1, "a")], "k int, v string"), p)
    with pytest.raises(JodieValidationError, match="incompatible"):
        write_delta(
            spark.createDataFrame([("x", "b")], "k string, v string"),
            p,
            mode="append",
        )
    # wider numeric without mergeSchema also refuses, with the hint
    with pytest.raises(JodieValidationError, match="mergeSchema"):
        write_delta(
            spark.createDataFrame([(2**40, "b")], "k long, v string"),
            p,
            mode="append",
        )
    # the failed writes left no partial state
    assert DeltaTable.forPath(spark, p).toDF().count() == 1


def test_narrow_source_upcasts_silently(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "t")
    write_delta(spark.createDataFrame([(2**40, 1.5)], "k long, v double"), p)
    write_delta(
        spark.createDataFrame([(7, 2.5)], "k int, v double"), p, mode="append"
    )
    t = DeltaTable.forPath(spark, p)
    assert t.toDF().schema["k"].dataType.typeName() == "long"
    assert sorted(r["k"] for r in t.toDF().collect()) == [7, 2**40]


def test_widening_append_with_merge_schema(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "t")
    write_delta(
        spark.createDataFrame([(1, 1.5)], "k int, v float"),
        p,
        options={"delta.enableTypeWidening": "true"},
    )
    write_delta(
        spark.createDataFrame([(2**40, 2.5)], "k long, v double"),
        p,
        mode="append",
        options={"mergeSchema": "true"},
    )
    t = DeltaTable.forPath(spark, p)
    schema = t.toDF().schema
    assert schema["k"].dataType.typeName() == "long"
    assert schema["v"].dataType.typeName() == "double"
    # OLD narrow files and new wide files both read back correctly
    rows = sorted((r["k"], round(r["v"], 2)) for r in t.toDF().collect())
    assert rows == [(1, 1.5), (2**40, 2.5)]
    # protocol carries the reader+writer feature
    proto = t.snapshot().protocol
    assert "typeWidening" in proto["writerFeatures"]
    assert "typeWidening" in proto["readerFeatures"]
    # schema metadata records the change
    md = t.schema()["k"].metadata
    assert md["delta.typeChanges"][0]["fromType"] == "integer"
    assert md["delta.typeChanges"][0]["toType"] == "long"


def test_widened_table_reads_through_datasource(spark, tmpdir_path):
    from jodie_spark.sources.datasource import register

    register(spark)
    p = os.path.join(tmpdir_path, "t")
    write_delta(
        spark.createDataFrame([(1,)], "k int"),
        p,
        options={"delta.enableTypeWidening": "true"},
    )
    write_delta(
        spark.createDataFrame([(2**40,)], "k long"),
        p,
        mode="append",
        options={"mergeSchema": "true"},
    )
    got = sorted(
        r["k"] for r in spark.read.format("jodie_delta").load(p).collect()
    )
    assert got == [1, 2**40]


def test_widening_composes_with_new_columns(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "t")
    write_delta(
        spark.createDataFrame([(1,)], "k int"),
        p,
        options={"delta.enableTypeWidening": "true"},
    )
    write_delta(
        spark.createDataFrame([(2**40, "x")], "k long, extra string"),
        p,
        mode="append",
        options={"mergeSchema": "true"},
    )
    t = DeltaTable.forPath(spark, p)
    rows = sorted((r["k"], r["extra"]) for r in t.toDF().collect())
    assert rows == [(1, None), (2**40, "x")]
    assert t.toDF().schema["k"].dataType.typeName() == "long"


def test_widening_through_schema_evolution_merge(spark, tmpdir_path):
    """Round 7: MERGE withSchemaEvolution adopts a SAFE wider source
    type (int->long, float->double) instead of narrowing the source
    through a cast — with the same typeChanges metadata + reader/writer
    feature upgrade the append path's mergeSchema widening writes. Old
    narrow files keep reading (per-file up-cast), unsafe conflicts
    still resolve to the target type."""
    import os

    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "wevolve")
    write_delta(
        spark.createDataFrame([(1, 10, 1.5), (2, 20, 2.5)], "k int, n int, x float"),
        p,
        options={"delta.enableTypeWidening": "true"},
    )
    t = DeltaTable.forPath(spark, p)
    src = spark.createDataFrame(
        [(2, 9_000_000_000, 2.25, "b"), (3, 30, 3.25, "c")],
        "k int, n long, x double, tag string",
    )
    (
        t.alias("t")
        .merge(src.alias("s"), "t.k = s.k")
        .withSchemaEvolution()
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    t2 = DeltaTable.forPath(spark, p)
    sch = {f.name: f for f in t2.schema().fields}
    assert sch["n"].dataType.typeName() == "long"
    assert sch["x"].dataType.typeName() == "double"
    changes = dict(sch["n"].metadata)["delta.typeChanges"]
    assert changes[0]["fromType"] == "integer" and changes[0]["toType"] == "long"
    proto = t2.snapshot().protocol
    assert "typeWidening" in (proto.get("writerFeatures") or [])
    assert "typeWidening" in (proto.get("readerFeatures") or [])
    rows = {r["k"]: r for r in t2.toDF().collect()}
    assert rows[2]["n"] == 9_000_000_000 and rows[2]["tag"] == "b"
    assert rows[1]["n"] == 10 and rows[1]["tag"] is None  # copied narrow row
    assert rows[3]["x"] == 3.25
    # old narrow files still read + further DML works
    t2.update("k = 1", {"n": "n + 1"})
    assert {r["k"]: r["n"] for r in t2.toDF().collect()}[1] == 11


def test_widening_gated_on_table_property(spark, tmpdir_path):
    """Regression (round-8 advice): without delta.enableTypeWidening,
    automatic widening must not happen — it would silently upgrade the
    reader protocol and lock out external readers. Append+mergeSchema
    with a wider type fails with a property hint; MERGE
    withSchemaEvolution keeps the target type and casts the source
    down; no typeWidening feature ever lands on the protocol."""
    p = os.path.join(tmpdir_path, "nogate")
    write_delta(spark.createDataFrame([(1, 10)], "k int, n int"), p)
    with pytest.raises(JodieValidationError, match="enableTypeWidening"):
        write_delta(
            spark.createDataFrame([(2, 9_000_000_000)], "k int, n long"),
            p,
            mode="append",
            options={"mergeSchema": "true"},
        )

    t = DeltaTable.forPath(spark, p)
    # long-typed source that still FITS in int: the gate keeps the
    # target type and casts the source down (an overflowing value
    # would correctly fail the ANSI cast instead)
    src = spark.createDataFrame(
        [(1, 99, "b"), (3, 30, "c")], "k int, n long, tag string"
    )
    (
        t.alias("t")
        .merge(src.alias("s"), "t.k = s.k")
        .withSchemaEvolution()
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    t2 = DeltaTable.forPath(spark, p)
    sch = {f.name: f for f in t2.schema().fields}
    # new column appended, but n stays int (source cast down)
    assert sch["n"].dataType.typeName() == "integer"
    assert "tag" in sch
    assert {r["k"]: r["n"] for r in t2.toDF().collect()} == {1: 99, 3: 30}
    proto = t2.snapshot().protocol
    assert "typeWidening" not in (proto.get("writerFeatures") or [])
    assert "typeWidening" not in (proto.get("readerFeatures") or [])
    # opting in later unlocks widening on the SAME table
    t2.set_properties({"delta.enableTypeWidening": "true"})
    write_delta(
        spark.createDataFrame([(4, 9_000_000_001, "d")], "k int, n long, tag string"),
        p,
        mode="append",
        options={"mergeSchema": "true"},
    )
    t3 = DeltaTable.forPath(spark, p)
    assert t3.schema()["n"].dataType.typeName() == "long"
    assert "typeWidening" in (t3.snapshot().protocol.get("readerFeatures") or [])
