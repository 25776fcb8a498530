"""Delta identity columns: generation, watermark persistence, guards."""

import os

import pytest

from jodie_spark.errors import JodieValidationError


def _ids(table):
    return sorted(r["id"] for r in table.toDF().select("id").collect())


def test_create_generates_contiguous_block(spark, tmpdir_path):
    from jodie_spark.tables.identity import identity_columns_of
    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "t")
    df = spark.range(0, 100).selectExpr("id * 2 as payload").repartition(7)
    write_delta(df, p, identity_columns={"id": {"start": 10, "step": 5}})
    t = DeltaTable.forPath(spark, p)
    assert _ids(t) == list(range(10, 10 + 5 * 100, 5))
    spec = identity_columns_of(t.schema())["id"]
    assert spec["high_water_mark"] == 10 + 5 * 99
    assert spec["allow_explicit"] is False
    proto = t.snapshot().protocol
    assert int(proto["minWriterVersion"]) == 6


def test_append_continues_past_watermark(spark, tmpdir_path):
    from jodie_spark.tables.identity import identity_columns_of
    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "t")
    write_delta(
        spark.range(0, 10).selectExpr("cast(id as string) as v"),
        p,
        identity_columns={"id": {}},
    )
    write_delta(
        spark.range(0, 7).selectExpr("cast(id + 100 as string) as v").repartition(3),
        p,
        mode="append",
    )
    t = DeltaTable.forPath(spark, p)
    assert _ids(t) == list(range(1, 18))
    assert identity_columns_of(t.schema())["id"]["high_water_mark"] == 17
    # values are unique across the two commits even though layouts differ
    assert t.toDF().select("id").distinct().count() == 17


def test_explicit_insert_gating(spark, tmpdir_path):
    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "always")
    write_delta(
        spark.range(3).selectExpr("cast(id as string) as v"),
        p,
        identity_columns={"id": {}},
    )
    with pytest.raises(JodieValidationError, match="GENERATED ALWAYS"):
        write_delta(
            spark.range(3).selectExpr("id", "cast(id as string) as v"),
            p,
            mode="append",
        )

    p2 = os.path.join(tmpdir_path, "bydefault")
    write_delta(
        spark.range(3).selectExpr("cast(id as string) as v"),
        p2,
        identity_columns={"id": {"allow_explicit": True}},
    )
    write_delta(
        spark.createDataFrame([(1000, "x")], "id long, v string"),
        p2,
        mode="append",
    )
    t2 = DeltaTable.forPath(spark, p2)
    assert 1000 in _ids(t2)
    # explicit values never advance the watermark
    from jodie_spark.tables.identity import identity_columns_of

    assert identity_columns_of(t2.schema())["id"]["high_water_mark"] == 3
    # next generated block still starts after the GENERATED watermark
    write_delta(
        spark.range(1).selectExpr("cast(id as string) as v"), p2, mode="append"
    )
    assert 4 in _ids(DeltaTable.forPath(spark, p2))


def test_empty_append_keeps_watermark(spark, tmpdir_path):
    from jodie_spark.tables.identity import identity_columns_of
    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "t")
    write_delta(
        spark.range(5).selectExpr("cast(id as string) as v"),
        p,
        identity_columns={"id": {}},
    )
    empty = spark.range(0).selectExpr("cast(id as string) as v")
    write_delta(empty, p, mode="append")
    t = DeltaTable.forPath(spark, p)
    assert identity_columns_of(t.schema())["id"]["high_water_mark"] == 5
    assert _ids(t) == [1, 2, 3, 4, 5]


def test_dml_guards(spark, tmpdir_path):
    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "t")
    write_delta(
        spark.range(5).selectExpr("cast(id as string) as v"),
        p,
        identity_columns={"id": {}},
    )
    t = DeltaTable.forPath(spark, p)
    with pytest.raises(JodieValidationError, match="identity"):
        t.update("v = '1'", {"id": "99"})
    src = spark.createDataFrame([(99, "z")], "id long, v string")
    with pytest.raises(JodieValidationError, match="GENERATED\nALWAYS|GENERATED ALWAYS"):
        t.merge(src, "t.id = s.id").whenNotMatchedInsertAll().execute()
    # updates not touching the identity column still work
    t.update("v = '1'", {"v": "'one'"})
    assert t.toDF().filter("v = 'one'").count() == 1
    # delete unaffected
    t.delete("v = 'one'")
    assert _ids(t) == [1, 3, 4, 5]


def test_identity_with_negative_step_and_restore(spark, tmpdir_path):
    from jodie_spark.tables.identity import identity_columns_of
    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "t")
    write_delta(
        spark.range(4).selectExpr("cast(id as string) as v"),
        p,
        identity_columns={"id": {"start": 0, "step": -2}},
    )
    t = DeltaTable.forPath(spark, p)
    assert _ids(t) == [-6, -4, -2, 0]
    assert identity_columns_of(t.schema())["id"]["high_water_mark"] == -6
    write_delta(spark.range(1).selectExpr("'x' as v"), p, mode="append")
    assert -8 in _ids(DeltaTable.forPath(spark, p))


def test_step_zero_and_bad_type_rejected(spark, tmpdir_path):
    from jodie_spark.tables.table import write_delta

    with pytest.raises(JodieValidationError, match="non-zero"):
        write_delta(
            spark.range(1).selectExpr("'a' as v"),
            os.path.join(tmpdir_path, "z"),
            identity_columns={"id": {"step": 0}},
        )
    with pytest.raises(JodieValidationError, match="integer-typed"):
        write_delta(
            spark.range(1).selectExpr("'a' as id", "'b' as v"),
            os.path.join(tmpdir_path, "s"),
            identity_columns={"id": {"allow_explicit": True}},
        )


def test_merge_generates_identity_for_inserts(spark, tmpdir_path):
    from jodie_spark.tables.identity import identity_columns_of
    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "mgen")
    write_delta(
        spark.createDataFrame([("a",), ("b",)], "v string"),
        p,
        identity_columns={"id": {"start": 1, "step": 1}},
    )
    t = DeltaTable.forPath(spark, p)
    src = spark.createDataFrame([("b", "B"), ("c", "C"), ("d", "D")], "v string, nv string")
    (
        t.alias("t")
        .merge(src.alias("s"), "t.v = s.v")
        .whenMatchedUpdate(set={"v": "s.nv"})
        .whenNotMatchedInsert(values={"v": "s.nv"})
        .execute()
    )
    t = DeltaTable.forPath(spark, p)
    rows = {r["v"]: r["id"] for r in t.toDF().collect()}
    # a kept id 1 or 2; b updated in place (id preserved); C,D inserted with ids 3,4
    assert set(rows) == {"a", "B", "C", "D"}
    assert sorted(rows.values()) == [1, 2, 3, 4]
    assert rows["B"] in (1, 2)  # update never rewrites the identity value
    assert identity_columns_of(t.schema())["id"]["high_water_mark"] == 4
    # the next append continues past the merge-advanced watermark
    write_delta(spark.createDataFrame([("e",)], "v string"), p, mode="append")
    assert sorted(
        r["id"] for r in DeltaTable.forPath(spark, p).toDF().collect()
    ) == [1, 2, 3, 4, 5]


def test_merge_identity_generation_refused_with_cdf(spark, tmpdir_path):
    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "mgencdf")
    write_delta(
        spark.createDataFrame([("a",)], "v string"),
        p,
        identity_columns={"id": {}},
        options={"delta.enableChangeDataFeed": "true"},
    )
    t = DeltaTable.forPath(spark, p)
    src = spark.createDataFrame([("z",)], "v string")
    with pytest.raises(JodieValidationError, match="CDF"):
        (
            t.alias("t")
            .merge(src.alias("s"), "t.v = s.v")
            .whenNotMatchedInsert(values={"v": "s.v"})
            .execute()
        )
