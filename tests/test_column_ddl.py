"""Schema-evolution DDL: enable_column_mapping / add_columns /
rename_column / drop_column, and physical-name writes on mapped
tables."""

import os

import pytest
from pyspark.sql import functions as F

from jodie_spark.errors import DeltaProtocolError, JodieValidationError
from jodie_spark.tables.table import DeltaTable, write_delta


def _mk(spark, tmpdir_path, name="t", partition_by=None, options=None):
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", "x")], ["id", "val", "part"]
    )
    path = os.path.join(tmpdir_path, name)
    write_delta(df, path, partition_by=partition_by, options=options)
    return DeltaTable.forPath(spark, path)


def test_enable_column_mapping_roundtrip(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    assert t.column_mapping_mode() == "none"
    t.enable_column_mapping()
    assert t.column_mapping_mode() == "name"
    t.enable_column_mapping()  # idempotent no-op
    snap = t.snapshot()
    proto = snap.protocol
    assert proto["minReaderVersion"] == 3 and proto["minWriterVersion"] == 7
    assert "columnMapping" in proto["readerFeatures"]
    assert "columnMapping" in proto["writerFeatures"]
    assert snap.configuration["delta.columnMapping.maxColumnId"] == "3"
    # existing data still reads; physical names equal pre-upgrade names
    assert sorted(r["id"] for r in t.toDF().collect()) == [1, 2, 3]
    # appends still work (physical == logical here)
    write_delta(t.toDF().limit(1), t.path, mode="append")
    assert t.toDF().count() == 4


def test_rename_column_metadata_only(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    v_before = t.snapshot().version
    t.rename_column("val", "label")  # auto-enables mapping
    assert t.column_mapping_mode() == "name"
    df = t.toDF()
    assert "label" in df.columns and "val" not in df.columns
    assert sorted(r["label"] for r in df.collect()) == ["a", "b", "c"]
    # two commits (enable + rename), zero data files written
    snap = t.snapshot()
    assert snap.version == v_before + 2
    assert len(snap.add_files()) == len(t.snapshot(v_before).add_files())
    # append through the logical schema lands in the ORIGINAL physical name
    extra = spark.createDataFrame([(9, "z", "q")], ["id", "label", "part"])
    write_delta(extra, t.path, mode="append")
    out = {r["id"]: r["label"] for r in t.toDF().collect()}
    assert out[9] == "z" and out[1] == "a"
    # history records the DDL
    ops = [r["operation"] for r in t.history().collect()]
    assert "RENAME COLUMN" in ops


def test_rename_partition_column(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path, partition_by=["part"])
    t.rename_column("part", "bucket")
    df = t.toDF()
    assert sorted(r["bucket"] for r in df.collect()) == ["x", "x", "y"]
    # appends keep landing in the original physical partition dirs
    write_delta(
        spark.createDataFrame([(4, "d", "y")], ["id", "val", "bucket"]),
        t.path,
        mode="append",
    )
    assert t.toDF().filter(F.col("bucket") == "y").count() == 2
    # the on-disk layout still uses the physical (original) name
    assert any(d.startswith("part=") for d in os.listdir(t.path))


def test_drop_and_readd_column_does_not_resurrect(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    t.drop_column("val")
    assert t.toDF().columns == ["id", "part"]
    # re-adding the same logical name maps to a FRESH physical column:
    # the old bytes must stay invisible (delta-spark semantics)
    t.add_columns({"val": "string"})
    vals = [r["val"] for r in t.toDF().collect()]
    assert vals == [None, None, None]


def test_add_columns_unmapped_table(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    t.add_columns({"score": "double"})
    assert t.toDF().schema["score"].dataType.typeName() == "double"
    assert [r["score"] for r in t.toDF().collect()] == [None, None, None]
    with pytest.raises(JodieValidationError):
        t.add_columns({"id": "long"})  # duplicate
    with pytest.raises(JodieValidationError):
        t.add_columns({})


def test_create_mapped_table_physical_files(spark, tmpdir_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "val"])
    path = os.path.join(tmpdir_path, "mapped")
    write_delta(df, path, options={"delta.columnMapping.mode": "name"})
    t = DeltaTable.forPath(spark, path)
    assert t.column_mapping_mode() == "name"
    assert sorted(tuple(r) for r in t.toDF().collect()) == [(1, "a"), (2, "b")]
    # parquet files must carry col-<uuid> physical names, not logical ones
    import pyarrow.parquet as pq

    f = next(
        os.path.join(path, n) for n in os.listdir(path) if n.endswith(".parquet")
    )
    names = pq.read_schema(f).names
    assert all(n.startswith("col-") for n in names), names
    # append + overwrite still work and stay logical at the API surface
    write_delta(df, path, mode="append")
    assert t.toDF().count() == 4
    write_delta(df, path, mode="overwrite")
    assert t.toDF().count() == 2


def test_mapped_partitioned_create(spark, tmpdir_path):
    df = spark.createDataFrame([(1, "a", "x"), (2, "b", "y")], ["id", "val", "part"])
    path = os.path.join(tmpdir_path, "mp")
    write_delta(
        df, path, partition_by=["part"], options={"delta.columnMapping.mode": "name"}
    )
    t = DeltaTable.forPath(spark, path)
    assert sorted(r["part"] for r in t.toDF().collect()) == ["x", "y"]
    # partition dirs are physical col-<uuid>=value
    assert any(d.startswith("col-") and "=" in d for d in os.listdir(path))
    assert t.toDF().filter(F.col("part") == "x").count() == 1


def test_dml_on_mapped_tables(spark, tmpdir_path):
    """DELETE/UPDATE/MERGE/OPTIMIZE run on a mapped (upgraded) table:
    conditions evaluate on logical names, rewritten files stay
    physical-named."""
    t = _mk(spark, tmpdir_path)
    t.enable_column_mapping()
    t.delete("id = 1")
    assert {r["id"] for r in t.toDF().collect()} == {2, 3}
    t.update("id = 2", {"val": F.lit("bb")})
    assert {r["id"]: r["val"] for r in t.toDF().collect()}[2] == "bb"
    src = spark.createDataFrame([(3, "cc", "x"), (9, "i", "y")], ["id", "val", "part"])
    (
        t.alias("old")
        .merge(src.alias("new"), "old.id = new.id")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    got = {r["id"]: r["val"] for r in t.toDF().collect()}
    assert got == {2: "bb", 3: "cc", 9: "i"}
    t.optimize().executeCompaction()
    assert {r["id"] for r in t.toDF().collect()} == {2, 3, 9}
    t.optimize().executeZOrderBy("id")
    assert t.toDF().count() == 3


def test_dml_after_rename_writes_physical_files(spark, tmpdir_path):
    """DML through RENAMED logical names: pruning is disabled (name
    collisions would mis-prune) but results are exact, and the rewrite
    files carry the pinned physical names."""
    import pyarrow.parquet as pq

    t = _mk(spark, tmpdir_path)
    t.rename_column("val", "label")
    t.delete("label = 'a'")
    assert sorted(r["label"] for r in t.toDF().collect()) == ["b", "c"]
    t.update("label = 'b'", {"label": F.lit("B")})
    assert sorted(r["label"] for r in t.toDF().collect()) == ["B", "c"]
    src = spark.createDataFrame([(3, "C", "x")], ["id", "label", "part"])
    (
        t.alias("tgt")
        .merge(src.alias("s"), "tgt.id = s.id")
        .whenMatchedUpdateAll()
        .execute()
    )
    assert sorted(r["label"] for r in t.toDF().collect()) == ["B", "C"]
    # every live data file must store the PHYSICAL column name ('val')
    for a in t.snapshot().add_files():
        f = os.path.join(t.path, a["path"])
        names = pq.read_schema(f).names
        assert "val" in names and "label" not in names, names


def test_mapped_cdf_dml_writes_physical_cdc(spark, tmpdir_path):
    """Round 4: mapped+CDF DML is supported — cdc files carry physical
    names and the CDF reader resolves them (previously refused)."""
    from jodie_spark.operators.cdf import ChangeDataFeedHelper

    t = _mk(
        spark, tmpdir_path, options={"delta.enableChangeDataFeed": "true"}
    )
    t.enable_column_mapping()
    t.delete("id = 1")
    t.update("id = 2", {"val": F.lit("z")})
    cdf = ChangeDataFeedHelper(spark, t.path, 2).read_cdf()
    kinds = {(r["id"], r["_change_type"]) for r in cdf.collect()}
    assert (1, "delete") in kinds
    assert (2, "update_postimage") in kinds


def test_rename_refused_when_referenced(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    t.add_check_constraint("pos_id", "id > 0")
    with pytest.raises(JodieValidationError, match="pos_id"):
        t.rename_column("id", "ident")
    with pytest.raises(JodieValidationError, match="pos_id"):
        t.drop_column("id")
    # un-referenced columns still rename fine
    t.rename_column("val", "v2")
    assert "v2" in t.toDF().columns


def test_drop_column_guards(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path, partition_by=["part"])
    with pytest.raises(JodieValidationError, match="partition"):
        t.drop_column("part")
    with pytest.raises(JodieValidationError, match="does not exist"):
        t.drop_column("nope")
    with pytest.raises(JodieValidationError, match="does not exist"):
        t.rename_column("nope", "x")
    t.rename_column("val", "value")
    with pytest.raises(JodieValidationError, match="already exists"):
        t.rename_column("id", "value")


def test_overwrite_schema_change_refused_on_mapped(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    t.enable_column_mapping()
    other = spark.createDataFrame([(1, 2.0)], ["id", "score"])
    with pytest.raises(JodieValidationError, match="column-mapped"):
        write_delta(
            other, t.path, mode="overwrite", options={"overwriteSchema": "true"}
        )


def test_merge_schema_append_on_mapped_table(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    t.enable_column_mapping()
    extra = spark.createDataFrame([(7, "g", "x", 1.5)], ["id", "val", "part", "score"])
    write_delta(extra, t.path, mode="append", options={"mergeSchema": "true"})
    df = t.toDF()
    assert "score" in df.columns
    got = {r["id"]: r["score"] for r in df.collect()}
    assert got[7] == 1.5 and got[1] is None
    # the new column's physical name is a fresh col-<uuid>
    fld = t.schema()["score"]
    assert fld.metadata["delta.columnMapping.physicalName"].startswith("col-")
    assert int(t.snapshot().configuration["delta.columnMapping.maxColumnId"]) == 4


def test_create_table_column_ddl_full_lifecycle(spark, tmpdir_path):
    """CREATE TABLE with identity / generated / default / NOT NULL
    column specs routed onto the native writer features (VERDICT r3
    task 7)."""
    import os

    from jodie_spark.sql import sql
    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "cddl")
    sql(
        spark,
        f"""CREATE TABLE delta.`{p}` (
            id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 2),
            ts TIMESTAMP,
            day STRING GENERATED ALWAYS AS (substring(CAST(ts AS STRING), 1, 10)),
            qty INT NOT NULL DEFAULT 42,
            tag STRING COMMENT 'a tag',
            m MAP<STRING, INT>
        ) USING DELTA TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true')""",
    )
    t = DeltaTable.forPath(spark, p)
    fields = {f.name: (f.dataType.simpleString(), f.nullable) for f in t.schema().fields}
    assert fields["qty"] == ("int", False)
    assert fields["m"] == ("map<string,int>", True)
    assert t.snapshot().configuration["delta.enableChangeDataFeed"] == "true"

    df = spark.createDataFrame(
        [("2024-03-05 01:02:03", "x")], "ts string, tag string"
    ).selectExpr("CAST(ts AS TIMESTAMP) ts", "tag")
    write_delta(df, p, mode="append")
    r = DeltaTable.forPath(spark, p).toDF().collect()[0]
    assert (r["id"], r["day"], r["qty"], r["tag"]) == (10, "2024-03-05", 42, "x")

    # IF NOT EXISTS on an existing table is a no-op
    sql(spark, f"CREATE TABLE IF NOT EXISTS delta.`{p}` (x INT) USING DELTA")
    assert len(DeltaTable.forPath(spark, p).schema().fields) == 6


def test_create_table_ddl_not_null_enforced(spark, tmpdir_path):
    import os

    import pytest

    from jodie_spark.sql import sql
    from jodie_spark.tables.table import write_delta

    p = os.path.join(tmpdir_path, "cddl_nn")
    sql(spark, f"CREATE TABLE delta.`{p}` (id BIGINT, q INT NOT NULL) USING DELTA")
    with pytest.raises(Exception, match="NOT NULL"):
        write_delta(
            spark.createDataFrame([(1, None)], "id long, q int"), p, mode="append"
        )
    # datasource writer enforces it too (executor-side batch check)
    from jodie_spark.sources.datasource import register

    register(spark)
    with pytest.raises(Exception, match="NOT NULL"):
        spark.createDataFrame([(1, None)], "id long, q int").write.format(
            "jodie_delta"
        ).mode("append").save(p)


def test_datasource_writer_refuses_shape_mismatches(spark, tmpdir_path):
    """The raw datasource writer must refuse shapes it cannot write
    faithfully: extra columns, missing columns, fillable columns,
    partitioned layouts (it previously dropped/nulled them silently)."""
    import os

    import pytest

    from jodie_spark.sources.datasource import register
    from jodie_spark.sql import sql
    from jodie_spark.tables.table import write_delta

    register(spark)
    p = os.path.join(tmpdir_path, "dsguard")
    write_delta(spark.createDataFrame([(1, "x")], "id long, v string"), p)
    with pytest.raises(Exception, match="schema mismatch"):
        spark.createDataFrame([(2, "y", "E")], "id long, v string, w string").write.format(
            "jodie_delta"
        ).mode("append").save(p)
    with pytest.raises(Exception, match="schema mismatch"):
        spark.createDataFrame([(9,)], "id long").write.format("jodie_delta").mode(
            "append"
        ).save(p)
    pp = os.path.join(tmpdir_path, "dsguard_part")
    write_delta(
        spark.createDataFrame([(1, "x")], "id long, grp string"), pp, partition_by=["grp"]
    )
    with pytest.raises(Exception, match="partitioned"):
        spark.createDataFrame([(3, "z")], "id long, grp string").write.format(
            "jodie_delta"
        ).mode("append").save(pp)
    pf = os.path.join(tmpdir_path, "dsguard_fill")
    sql(
        spark,
        f"CREATE TABLE delta.`{pf}` (id BIGINT GENERATED ALWAYS AS IDENTITY, "
        f"v STRING) USING DELTA",
    )
    with pytest.raises(Exception, match="write_delta"):
        spark.createDataFrame([("a",)], "v string").write.format("jodie_delta").mode(
            "append"
        ).save(pf)


def test_merge_schema_evolution_on_mapped_table(spark, tmpdir_path):
    """MERGE withSchemaEvolution on a mode=name mapped table whose
    physical names differ from the logical ones (post-rename): the new
    columns get fresh col-<uuid> physical names + column ids, the
    maxColumnId bumps, the rewrite writes physical-named files, and a
    fresh reader resolves everything. Closes the last DML refusal
    (reference mergeSchema semantics, DeltaHelpers.scala:354-379).
    Includes the nested-struct case: one evolved column is a struct,
    whose nested field needs its own id/physicalName."""
    t = _mk(spark, tmpdir_path, name="ev_name")
    t.enable_column_mapping()
    t.rename_column("val", "label")  # physical 'val' != logical 'label'
    before_max = int(t.snapshot().configuration["delta.columnMapping.maxColumnId"])
    src = spark.createDataFrame(
        [(2, "B", "y", 7, (1, "n1")), (9, "I", "z", 8, (2, "n2"))],
        "id int, label string, part string, score int, "
        "extra struct<a:int, b:string>",
    )
    (
        t.alias("old")
        .merge(src.alias("new"), "old.id = new.id")
        .withSchemaEvolution()
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    t2 = DeltaTable.forPath(spark, t.path)
    got = {r["id"]: r for r in t2.toDF().collect()}
    assert set(got) == {1, 2, 3, 9}
    assert got[2]["label"] == "B" and got[2]["score"] == 7
    assert got[2]["extra"]["a"] == 1 and got[2]["extra"]["b"] == "n1"
    assert got[9]["score"] == 8 and got[9]["extra"]["b"] == "n2"
    # untouched (copied) rows surface the evolved columns as NULL
    assert got[1]["score"] is None and got[1]["extra"] is None
    # mapping metadata: fresh ids + col-<uuid> physical names on the
    # new fields (incl. the struct's NESTED field), maxColumnId bumped
    schema = t2.schema()
    snap = t2.snapshot()
    by_name = {f.name: f for f in schema.fields}
    ids = []
    for name in ("score", "extra"):
        md = dict(by_name[name].metadata)
        assert md["delta.columnMapping.physicalName"].startswith("col-")
        ids.append(int(md["delta.columnMapping.id"]))
    nested = by_name["extra"].dataType["a"]
    nmd = dict(nested.metadata)
    assert nmd["delta.columnMapping.physicalName"].startswith("col-")
    ids.append(int(nmd["delta.columnMapping.id"]))
    assert all(i > before_max for i in ids)
    new_max = int(snap.configuration["delta.columnMapping.maxColumnId"])
    assert new_max == max(
        int(dict(f.metadata)["delta.columnMapping.id"])
        for f in [*schema.fields, *by_name["extra"].dataType.fields]
    )
    # the rewritten data files are PHYSICAL-named: no logical leak
    import glob

    import pyarrow.parquet as pqt

    newest = max(
        glob.glob(os.path.join(t.path, "*.parquet")), key=os.path.getmtime
    )
    names = set(pqt.read_schema(newest).names)
    assert "label" not in names and "score" not in names and "extra" not in names
    phys_label = dict(by_name["label"].metadata)[
        "delta.columnMapping.physicalName"
    ]
    assert phys_label in names  # == 'val', the pre-rename physical name


def test_merge_schema_evolution_on_id_mapped_table(spark, tmpdir_path):
    """MERGE withSchemaEvolution on a FOREIGN mode=id table (parquet
    names don't match physicalName — only footer field ids line up):
    the evolved column gets a fresh field id past the foreign
    maxColumnId, files this engine writes carry matching footer ids,
    and id-resolution reads the merged state back."""
    import glob

    import pyarrow.parquet as pqt
    from test_table import _mk_id_mapped_table

    path = _mk_id_mapped_table(tmpdir_path, spark)
    t = DeltaTable.forPath(spark, path)
    src = spark.createDataFrame(
        [(1, 9.9, "x", "hot"), (7, 0.1, "y", "new")],
        "id long, score double, part string, tier string",
    ).select(
        "id",
        F.struct(F.col("score")).alias("info"),
        "part",
        "tier",
    )
    (
        t.alias("old")
        .merge(src.alias("new"), "old.id = new.id")
        .withSchemaEvolution()
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    t2 = DeltaTable.forPath(spark, path)
    got = {r["id"]: r for r in t2.toDF().collect()}
    assert set(got) == {1, 2, 3, 7}
    assert got[1]["tier"] == "hot" and got[1]["info"]["score"] == 9.9
    assert got[7]["tier"] == "new"
    assert got[2]["tier"] is None  # copied row: evolved column NULL
    snap = t2.snapshot()
    md = dict({f.name: f for f in t2.schema().fields}["tier"].metadata)
    assert int(md["delta.columnMapping.id"]) > 4  # foreign maxColumnId
    assert int(snap.configuration["delta.columnMapping.maxColumnId"]) == int(
        md["delta.columnMapping.id"]
    )
    # files written by this merge carry footer field ids for the new
    # column, so the foreign field-id readers that own the table keep
    # resolving every column including the evolved one
    tier_id = str(md["delta.columnMapping.id"]).encode()
    newest = max(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True),
        key=os.path.getmtime,
    )
    sch = pqt.read_schema(newest)
    field_ids = {
        (f.metadata or {}).get(b"PARQUET:field_id") for f in sch
    }
    assert tier_id in field_ids


def test_merge_schema_evolution_mapped_with_cdf(spark, tmpdir_path):
    """Evolution merge on a mapped table with CDF enabled: the change
    files are physical-named for ALL columns including the evolved one,
    and readCDF surfaces the logical names."""
    t = _mk(
        spark,
        tmpdir_path,
        name="ev_cdf",
        options={"delta.enableChangeDataFeed": "true"},
    )
    t.enable_column_mapping()
    t.rename_column("val", "label")
    v_before = t.snapshot().version
    src = spark.createDataFrame(
        [(3, "CC", "x", 42)], "id int, label string, part string, score int"
    )
    (
        t.alias("old")
        .merge(src.alias("new"), "old.id = new.id")
        .withSchemaEvolution()
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    from jodie_spark.operators.cdf import read_cdf

    changes = read_cdf(spark, t.path, starting_version=v_before + 1)
    by_type = {
        r["_change_type"]: r for r in changes.collect() if r["id"] == 3
    }
    assert by_type["update_postimage"]["score"] == 42
    assert by_type["update_postimage"]["label"] == "CC"
    assert by_type["update_preimage"]["score"] is None


def test_merge_on_id_mapped_table_completes_with_metrics(spark, tmpdir_path):
    """Regression (round 7): plain MERGE on a mode=id table used to
    hang forever in Observation.get — the source-rows observation was
    registered on the parent session while the action executed on the
    field-id child session, whose listener bus is separate. The merge
    must complete and still record an accurate numSourceRows."""
    from test_table import _mk_id_mapped_table

    path = _mk_id_mapped_table(tmpdir_path, spark)
    t = DeltaTable.forPath(spark, path)
    src = spark.createDataFrame(
        [(3, 3.5, "y"), (4, 4.0, "x")], "id long, score double, part string"
    ).select("id", F.struct(F.col("score")).alias("info"), "part")
    (
        t.alias("old")
        .merge(src.alias("new"), "old.id = new.id")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    t2 = DeltaTable.forPath(spark, path)
    got = {r["id"]: r["info"]["score"] for r in t2.toDF().collect()}
    assert got == {1: 0.5, 2: 1.0, 3: 3.5, 4: 4.0}
    hist = {
        r["version"]: r for r in t2.history().collect()
    }
    m = hist[max(hist)]["operationMetrics"]
    assert m["numSourceRows"] == "2"
    assert m["numTargetRowsUpdated"] == "1"
    assert m["numTargetRowsInserted"] == "1"


def test_merge_schema_evolution_nested_struct_field(spark, tmpdir_path):
    """Round-7 depth: withSchemaEvolution merges NESTED fields — a new
    field inside an existing struct column appends within that struct
    (delta-spark mergeSchema semantics), on both unmapped and mapped
    targets; pre-evolution rows surface it as NULL."""
    from jodie_spark.tables.table import DeltaTable, write_delta

    for mapped in (False, True):
        p = os.path.join(tmpdir_path, f"nested_{mapped}")
        write_delta(
            spark.createDataFrame(
                [(1, (10, "a")), (2, (20, "b"))],
                "k int, info struct<x:int, y:string>",
            ),
            p,
            options={"delta.columnMapping.mode": "name"} if mapped else None,
        )
        t = DeltaTable.forPath(spark, p)
        src = spark.createDataFrame(
            [(2, (21, "B", 2.5)), (3, (30, "C", 3.5))],
            "k int, info struct<x:int, y:string, z:double>",
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
        got = {r["k"]: r["info"] for r in t2.toDF().collect()}
        assert got[1]["x"] == 10 and got[1]["z"] is None  # copied row
        assert got[2]["z"] == 2.5 and got[2]["y"] == "B"
        assert got[3]["z"] == 3.5
        info = {f.name: f for f in t2.schema().fields}["info"]
        assert [f.name for f in info.dataType.fields] == ["x", "y", "z"]
        if mapped:
            zmd = dict(info.dataType["z"].metadata)
            assert zmd["delta.columnMapping.physicalName"].startswith("col-")
            assert int(
                t2.snapshot().configuration["delta.columnMapping.maxColumnId"]
            ) == int(zmd["delta.columnMapping.id"])


def test_merge_star_source_struct_field_order_aligned_by_name(spark, tmpdir_path):
    """Struct values in star clauses align by FIELD NAME, never by
    position: a source struct<y, x> merged into a target struct<x, y>
    must land x->x / y->y (a positional cast would silently swap)."""
    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "reorder")
    write_delta(
        spark.createDataFrame(
            [(1, (10, "a"))], "k int, info struct<x:int, y:string>"
        ),
        p,
    )
    t = DeltaTable.forPath(spark, p)
    src = spark.createDataFrame(
        [(1, ("A", 11)), (2, ("B", 22))],
        "k int, info struct<y:string, x:int>",
    )
    (
        t.alias("t")
        .merge(src.alias("s"), "t.k = s.k")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    got = {r["k"]: r["info"] for r in DeltaTable.forPath(spark, p).toDF().collect()}
    assert got[1]["x"] == 11 and got[1]["y"] == "A"
    assert got[2]["x"] == 22 and got[2]["y"] == "B"


def test_merge_star_source_missing_target_column(spark, tmpdir_path):
    """Star clauses expand over the SOURCE columns (delta-spark
    semantics): a target column the source lacks keeps its value on
    UPDATE * and lands NULL on INSERT * — no error, no evolution
    needed. NULL source structs stay NULL through the name-aligned
    projection."""
    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "missingcol")
    write_delta(
        spark.createDataFrame(
            [(1, "keepme", (5, "n"))],
            "k int, note string, info struct<x:int, y:string>",
        ),
        p,
    )
    t = DeltaTable.forPath(spark, p)
    src = spark.createDataFrame(
        [(1, None), (2, (7, "q")), (3, None)],
        "k int, info struct<x:int, y:string>",
    )
    (
        t.alias("t")
        .merge(src.alias("s"), "t.k = s.k")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    rows = {r["k"]: r for r in DeltaTable.forPath(spark, p).toDF().collect()}
    assert rows[1]["note"] == "keepme"  # update kept the unsourced column
    assert rows[1]["info"] is None      # NULL source struct stayed NULL
    assert rows[2]["note"] is None and rows[2]["info"]["x"] == 7
    assert rows[3]["info"] is None


def test_merge_schema_evolution_array_of_struct(spark, tmpdir_path):
    """Evolution recurses through containers: a new field inside
    array<struct> elements appends within the element struct; existing
    rows surface it as NULL per element. Source elements align by
    name (reordered element fields don't swap)."""
    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "arrev")
    write_delta(
        spark.createDataFrame(
            [(1, [(10, "a"), (11, "b")])],
            "k int, items array<struct<x:int, y:string>>",
        ),
        p,
    )
    t = DeltaTable.forPath(spark, p)
    src = spark.createDataFrame(
        [(1, [("A", 12, 1.5)]), (2, [("B", 20, 2.5)])],
        "k int, items array<struct<y:string, x:int, w:double>>",
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
    elem = {f.name: f for f in t2.schema().fields}["items"].dataType.elementType
    assert [f.name for f in elem.fields] == ["x", "y", "w"]
    rows = {r["k"]: r["items"] for r in t2.toDF().collect()}
    assert rows[1][0]["x"] == 12 and rows[1][0]["y"] == "A" and rows[1][0]["w"] == 1.5
    assert rows[2][0]["x"] == 20 and rows[2][0]["w"] == 2.5


def test_cdf_read_spans_schema_evolution(spark, tmpdir_path):
    """read_cdf over a version range that CROSSES a schema-evolution
    merge: pre-evolution change files lack the new column and must
    surface it as NULL, post-evolution changes carry values."""
    from jodie_spark.operators.cdf import read_cdf
    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "cdfev")
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
        p,
        options={"delta.enableChangeDataFeed": "true"},
    )
    t = DeltaTable.forPath(spark, p)
    t.update("k = 1", {"v": "'a1'"})  # v1: pre-evolution changes
    src = spark.createDataFrame(
        [(2, "b2", 7), (3, "c", 9)], "k int, v string, score int"
    )
    (
        t.alias("t")
        .merge(src.alias("s"), "t.k = s.k")
        .withSchemaEvolution()
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )  # v2: evolution merge
    changes = read_cdf(spark, p, starting_version=1, ending_version=2)
    rows = sorted(
        (r["k"], r["_change_type"], r["_commit_version"], r["score"])
        for r in changes.collect()
    )
    assert rows == [
        (1, "update_postimage", 1, None),
        (1, "update_preimage", 1, None),
        (2, "update_postimage", 2, 7),
        (2, "update_preimage", 2, None),
        (3, "insert", 2, 9),
    ]


def test_evolution_merge_survives_v2_checkpoint_cold_replay(spark, tmpdir_path):
    """Matrix corner: schema-evolution merge on a column-mapped table
    with v2 checkpoints — after enough commits to trigger a checkpoint
    and a COLD log replay (fresh DeltaLog), the evolved schema, the
    maxColumnId bump, and the data all survive (round-6's checkpoint
    bug class, re-checked against the round-7 evolution path)."""
    from jodie_spark.tables.log import DeltaLog
    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "evckpt")
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
        p,
        options={
            "delta.columnMapping.mode": "name",
            "delta.checkpointPolicy": "v2",
        },
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
    max_id = int(
        DeltaTable.forPath(spark, p).snapshot().configuration[
            "delta.columnMapping.maxColumnId"
        ]
    )
    # force a checkpoint at the current version, then append past it
    log = DeltaLog(p)
    log.write_checkpoint(log.latest_version())
    write_delta(
        spark.createDataFrame([(4, "d", 1)], "k int, v string, score int"),
        p,
        mode="append",
    )
    # cold replay: fresh log object, replay rides the v2 checkpoint
    t2 = DeltaTable.forPath(spark, p)
    snap = t2.snapshot()
    assert int(snap.configuration["delta.columnMapping.maxColumnId"]) == max_id
    sch = {f.name: f for f in t2.schema().fields}
    assert dict(sch["score"].metadata)[
        "delta.columnMapping.physicalName"
    ].startswith("col-")
    rows = {r["k"]: (r["v"], r["score"]) for r in t2.toDF().collect()}
    assert rows == {1: ("a", None), 2: ("B", 7), 3: ("C", 9), 4: ("d", 1)}


def test_evolution_merge_partitioned_mapped_and_check_constraint(spark, tmpdir_path):
    """Matrix pins: (a) evolution merge on a PARTITIONED mapped table —
    partition dirs stay physical-named, new column is not a partition;
    (b) evolution merge on a table with an active CHECK constraint on a
    pre-existing column — constraint still enforced on the rewrite, new
    columns don't confuse it."""
    from jodie_spark.errors import JodieValidationError
    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "evpart")
    write_delta(
        spark.createDataFrame(
            [(1, "x", 5), (2, "y", 6)], "k int, part string, n int"
        ),
        p,
        partition_by=["part"],
        options={"delta.columnMapping.mode": "name"},
    )
    t = DeltaTable.forPath(spark, p)
    t.add_check_constraint("n_pos", "n > 0")
    src = spark.createDataFrame(
        [(2, "y", 60, "w"), (3, "z", 70, "v")], "k int, part string, n int, tag string"
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
    rows = {r["k"]: (r["part"], r["n"], r["tag"]) for r in t2.toDF().collect()}
    assert rows == {1: ("x", 5, None), 2: ("y", 60, "w"), 3: ("z", 70, "v")}
    # partition dirs are physical-named (mode=name at CREATE assigns
    # col-<uuid> physical names, and Hive dirs follow the physical name)
    assert any(d.startswith("col-") and "=" in d for d in os.listdir(p))
    assert not any(d.startswith("part=") for d in os.listdir(p))
    assert t2.toDF().filter(F.col("part") == "z").count() == 1
    # the constraint still bites through the evolved-merge path
    bad = spark.createDataFrame(
        [(4, "q", -1, "bad")], "k int, part string, n int, tag string"
    )
    with pytest.raises(Exception, match="n_pos|n > 0"):
        (
            t2.alias("t")
            .merge(bad.alias("s"), "t.k = s.k")
            .withSchemaEvolution()
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
