"""Generated columns (Delta writer v4): computed on write when absent,
validated when provided, enforced through update/merge."""

import os

import pytest
from pyspark.sql import functions as F

from jodie_spark.errors import JodieValidationError
from jodie_spark.tables.table import DeltaTable, write_delta


@pytest.fixture()
def gen_table(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "g")
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-02-05 11:00:00")], ["id", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    write_delta(
        df, p, partition_by=["day"], generated_columns={"day": "cast(ts as date)"}
    )
    return DeltaTable.forPath(spark, p)


def test_create_computes_and_persists_generation(spark, gen_table):
    rows = {r["id"]: str(r["day"]) for r in gen_table.toDF().collect()}
    assert rows == {1: "2024-01-01", 2: "2024-02-05"}
    assert int(gen_table.snapshot().protocol["minWriterVersion"]) == 4
    # expression persisted in schema metadata
    field = gen_table.schema()["day"]
    assert field.metadata["delta.generationExpression"] == "cast(ts as date)"


def test_append_computes_absent_generated_column(spark, gen_table):
    extra = spark.createDataFrame([(3, "2024-03-01 00:00:00")], ["id", "ts"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    write_delta(extra, gen_table.path, mode="append")
    got = gen_table.toDF().filter("id = 3").collect()[0]
    assert str(got["day"]) == "2024-03-01"


def test_append_validates_provided_generated_value(spark, gen_table):
    wrong = (
        spark.createDataFrame([(4, "2024-04-01 00:00:00")], ["id", "ts"])
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("day", F.lit("1999-01-01").cast("date"))
    )
    with pytest.raises(Exception, match="generation expression"):
        write_delta(wrong, gen_table.path, mode="append")
    assert gen_table.toDF().count() == 2  # nothing committed


def test_update_cannot_break_generation_contract(spark, gen_table):
    with pytest.raises(Exception, match="generation expression"):
        gen_table.update("id = 1", {"ts": "timestamp'2030-01-01 00:00:00'"})
    # consistent update (both columns) passes
    gen_table.update(
        "id = 1",
        {"ts": "timestamp'2024-01-02 00:00:00'", "day": "date'2024-01-02'"},
    )
    assert str(gen_table.toDF().filter("id = 1").collect()[0]["day"]) == "2024-01-02"


def test_merge_validates_generated_column(spark, gen_table):
    src = (
        spark.createDataFrame([(9, "2024-09-09 00:00:00")], ["id", "ts"])
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("day", F.lit("1999-01-01").cast("date"))
    )
    with pytest.raises(Exception, match="generation expression"):
        (
            gen_table.alias("t")
            .merge(src.alias("s"), "t.id = s.id")
            .whenNotMatchedInsertAll()
            .execute()
        )
    ok = src.withColumn("day", F.col("ts").cast("date"))
    (
        gen_table.alias("t")
        .merge(ok.alias("s"), "t.id = s.id")
        .whenNotMatchedInsertAll()
        .execute()
    )
    assert gen_table.toDF().count() == 3


def test_generated_columns_only_at_creation(spark, tmpdir_path, gen_table):
    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(JodieValidationError, match="creation"):
        write_delta(
            df, gen_table.path, mode="append", generated_columns={"y": "x + 1"}
        )


def test_partition_pruning_on_generated_column(spark, gen_table):
    """The point of generating a partition column: predicates on it
    prune files from the log's partitionValues."""
    from jodie_spark.tables.log import DeltaLog
    from jodie_spark.tables.pruning import prune_files

    snap = DeltaLog(gen_table.path).snapshot()
    adds = snap.add_files()
    assert len(adds) >= 2
    kept = prune_files(
        adds, "day = '2024-01-01'", gen_table.schema(), ["day"]
    )
    assert len(kept) < len(adds)


# ---------------------------------------------------------------------------
# column defaults (allowColumnDefaults)
# ---------------------------------------------------------------------------

def test_column_defaults_fill_absent_columns(spark, tmpdir_path):
    import os as _os

    from jodie_spark.errors import JodieValidationError
    from jodie_spark.tables.table import DeltaTable, write_delta

    p = _os.path.join(tmpdir_path, "defaults")
    write_delta(
        spark.createDataFrame([(1, "manual", 5)], "k int, src string, n int"),
        p,
        column_defaults={"src": "'crawl'", "n": "0"},
    )
    proto = DeltaTable.forPath(spark, p).snapshot().protocol
    assert "allowColumnDefaults" in proto["writerFeatures"]
    # append omitting both defaulted columns
    write_delta(spark.createDataFrame([(2,)], "k int"), p, mode="append")
    # append providing one of them
    write_delta(
        spark.createDataFrame([(3, "feed")], "k int, src string"), p, mode="append"
    )
    rows = sorted(
        tuple(r) for r in DeltaTable.forPath(spark, p).toDF().collect()
    )
    assert rows == [(1, "manual", 5), (2, "crawl", 0), (3, "feed", 0)]
    with pytest.raises(JodieValidationError, match="table creation"):
        write_delta(
            spark.createDataFrame([(9,)], "k int"), p, mode="append",
            column_defaults={"n": "1"},
        )
    with pytest.raises(JodieValidationError, match="not in data"):
        write_delta(
            spark.createDataFrame([(1,)], "k int"),
            _os.path.join(tmpdir_path, "d2"),
            column_defaults={"zz": "1"},
        )
