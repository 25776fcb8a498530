"""Remaining small-surface tests: validator, writer layout controls,
detail(), isDeltaTable."""

import os

import pytest

from jodie_spark.errors import JodieValidationError
from jodie_spark.tables.table import DeltaTable, write_delta
from jodie_spark.validators import validate_columns_exist_in_dataframe


def test_validator_messages(spark):
    df = spark.createDataFrame([(1, "a")], "id int, name string")
    validate_columns_exist_in_dataframe(["id", "name"], df)  # no raise
    with pytest.raises(JodieValidationError) as e:
        validate_columns_exist_in_dataframe(["id", "nope"], df)
    assert "nope" in str(e.value)


def test_writer_honors_max_records_per_file(spark, tmpdir_path):
    # parity shape: DeltaHelperSpec.scala:874 forces multi-file layouts
    path = os.path.join(tmpdir_path, "multi")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "4")
    try:
        write_delta(spark.range(10).withColumnRenamed("id", "x").coalesce(1), path)
    finally:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
    t = DeltaTable.forPath(spark, path)
    assert t.snapshot().num_files() == 3  # 4+4+2
    assert t.toDF().count() == 10


def test_detail_shape(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "det")
    write_delta(
        spark.createDataFrame([(1, "a")], "k int, p string"),
        path,
        partition_by=["p"],
        options={"delta.enableChangeDataFeed": "true"},
    )
    row = DeltaTable.forPath(spark, path).detail().collect()[0]
    assert row["format"] == "delta"
    assert row["partitionColumns"] == ["p"]
    assert row["numFiles"] >= 1 and row["sizeInBytes"] > 0
    assert row["properties"]["delta.enableChangeDataFeed"] == "true"
    assert row["location"] == os.path.abspath(path)


def test_is_delta_table(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "isdt")
    assert DeltaTable.isDeltaTable(spark, path) is False
    write_delta(spark.createDataFrame([(1,)], "x int"), path)
    assert DeltaTable.isDeltaTable(spark, path) is True
    with pytest.raises(Exception):
        DeltaTable.forPath(spark, os.path.join(tmpdir_path, "missing"))
