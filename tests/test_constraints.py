"""CHECK constraints: add/drop, full-scan validation, distributed
write-path enforcement (parity: delta-spark ALTER TABLE ADD CONSTRAINT
/ CheckDeltaInvariant)."""

import os

import pytest
from pyspark.sql import functions as F

from jodie_spark.errors import JodieValidationError
from jodie_spark.tables.table import DeltaTable, write_delta


@pytest.fixture()
def table(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "t")
    write_delta(
        spark.createDataFrame([(1, 10), (2, 20)], ["id", "v"]), p
    )
    return DeltaTable.forPath(spark, p)


def test_add_list_drop_roundtrip(table):
    table.add_check_constraint("v_positive", "v > 0")
    assert table.constraints() == {"v_positive": "v > 0"}
    # duplicate (case-insensitive) refused
    with pytest.raises(JodieValidationError, match="already exists"):
        table.add_check_constraint("V_POSITIVE", "v > 1")
    table.drop_check_constraint("V_positive")
    assert table.constraints() == {}
    with pytest.raises(JodieValidationError, match="does not exist"):
        table.drop_check_constraint("v_positive")


def test_add_validates_existing_rows(table):
    with pytest.raises(JodieValidationError, match="existing rows violate"):
        table.add_check_constraint("v_big", "v >= 20")
    assert table.constraints() == {}


def test_add_rejects_unresolvable_expression(table):
    with pytest.raises(JodieValidationError, match="does not resolve"):
        table.add_check_constraint("bad", "no_such_column > 0")


def test_append_enforces_constraint(spark, table):
    table.add_check_constraint("v_positive", "v > 0")
    # valid append passes
    write_delta(
        spark.createDataFrame([(3, 30)], ["id", "v"]), table.path, mode="append"
    )
    assert table.toDF().count() == 3
    # violating append fails the job and commits nothing
    with pytest.raises(Exception, match="v_positive"):
        write_delta(
            spark.createDataFrame([(4, -5)], ["id", "v"]), table.path, mode="append"
        )
    assert table.toDF().count() == 3
    # NULL passes (SQL CHECK semantics)
    write_delta(
        spark.createDataFrame([(5, None)], "id long, v long"),
        table.path,
        mode="append",
    )
    assert table.toDF().count() == 4


def test_update_enforces_constraint(spark, table):
    table.add_check_constraint("v_positive", "v > 0")
    with pytest.raises(Exception, match="v_positive"):
        table.update(condition="id = 1", set={"v": "-99"})
    assert {r["v"] for r in table.toDF().collect()} == {10, 20}
    table.update(condition="id = 1", set={"v": "99"})
    assert {r["v"] for r in table.toDF().collect()} == {99, 20}


def test_merge_enforces_constraint(spark, table):
    table.add_check_constraint("v_positive", "v > 0")
    bad = spark.createDataFrame([(9, -1)], ["id", "v"])
    with pytest.raises(Exception, match="v_positive"):
        (
            table.alias("t")
            .merge(bad.alias("s"), "t.id = s.id")
            .whenNotMatchedInsertAll()
            .execute()
        )
    assert table.toDF().count() == 2
    good = spark.createDataFrame([(9, 1)], ["id", "v"])
    (
        table.alias("t")
        .merge(good.alias("s"), "t.id = s.id")
        .whenNotMatchedInsertAll()
        .execute()
    )
    assert table.toDF().count() == 3


def test_constraint_bumps_writer_protocol(table):
    table.add_check_constraint("v_positive", "v > 0")
    proto = table.snapshot().protocol
    assert int(proto["minWriterVersion"]) >= 3


def test_create_with_constraint_option(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "c")
    with pytest.raises(Exception, match="nonneg"):
        write_delta(
            spark.createDataFrame([(1, -1)], ["id", "v"]),
            p,
            options={"delta.constraints.nonneg": "v >= 0"},
        )
