"""Ports of reference Type2ScdSpec — timestamp, date, and int SCD
column variants plus validation errors."""

import datetime
import os

import pytest

from jodie_spark.errors import JodieValidationError
from jodie_spark.operators import type2_generic_upsert, type2_upsert
from jodie_spark.tables.table import DeltaTable, write_delta


def _mk(spark, tmpdir_path, rows, schema, name="scd"):
    path = os.path.join(tmpdir_path, name)
    write_delta(spark.createDataFrame(rows, schema), path)
    return DeltaTable.forPath(spark, path)


def test_upsert_timestamp_columns(spark, tmpdir_path):
    # parity: Type2ScdSpec.scala:25-67
    t0 = datetime.datetime(2019, 1, 1)
    t1 = datetime.datetime(2020, 1, 1)
    t = _mk(
        spark,
        tmpdir_path,
        [(1, "A", True, t0, None), (2, "B", True, t0, None)],
        "pkey int, attr string, is_current boolean, effective_time timestamp, end_time timestamp",
    )
    updates = spark.createDataFrame(
        [(2, "Z", t1), (3, "C", t1)], "pkey int, attr string, effective_time timestamp"
    )
    type2_upsert(t, updates, "pkey", ["attr"])
    got = sorted(
        (r["pkey"], r["attr"], r["is_current"], r["end_time"]) for r in t.toDF().collect()
    )
    assert got == [
        (1, "A", True, None),
        (2, "B", False, t1),
        (2, "Z", True, None),
        (3, "C", True, None),
    ]


def test_generic_upsert_date_columns(spark, tmpdir_path):
    # parity: Type2ScdSpec.scala:173-216 (DATE SCD columns, custom names)
    d0 = datetime.date(2019, 1, 1)
    d1 = datetime.date(2020, 1, 1)
    t = _mk(
        spark,
        tmpdir_path,
        [(1, "A", True, d0, None)],
        "pkey int, attr string, cur boolean, effective_date date, end_date date",
    )
    updates = spark.createDataFrame(
        [(1, "B", d1)], "pkey int, attr string, effective_date date"
    )
    type2_generic_upsert(t, updates, "pkey", ["attr"], "cur", "effective_date", "end_date")
    got = sorted((r["pkey"], r["attr"], r["cur"], r["end_date"]) for r in t.toDF().collect())
    assert got == [(1, "A", False, d1), (1, "B", True, None)]


def test_generic_upsert_int_version_columns(spark, tmpdir_path):
    # parity: Type2ScdSpec.scala:218-263 (integer version SCD columns)
    t = _mk(
        spark,
        tmpdir_path,
        [(1, "A", True, 1, None)],
        "pkey int, attr string, cur boolean, effective_ver int, end_ver int",
    )
    updates = spark.createDataFrame([(1, "B", 2)], "pkey int, attr string, effective_ver int")
    type2_generic_upsert(t, updates, "pkey", ["attr"], "cur", "effective_ver", "end_ver")
    got = sorted((r["pkey"], r["attr"], r["cur"], r["end_ver"]) for r in t.toDF().collect())
    assert got == [(1, "A", False, 2), (1, "B", True, None)]


def test_multiple_attr_columns(spark, tmpdir_path):
    # parity: Type2ScdSpec.scala:126-169 — any changed attr closes the row
    t0 = datetime.datetime(2019, 1, 1)
    t1 = datetime.datetime(2020, 1, 1)
    t = _mk(
        spark,
        tmpdir_path,
        [(1, "A", "X", True, t0, None)],
        "pkey int, attr1 string, attr2 string, is_current boolean, "
        "effective_time timestamp, end_time timestamp",
    )
    updates = spark.createDataFrame(
        [(1, "A", "Y", t1)], "pkey int, attr1 string, attr2 string, effective_time timestamp"
    )
    type2_upsert(t, updates, "pkey", ["attr1", "attr2"])
    got = sorted((r["attr2"], r["is_current"]) for r in t.toDF().collect())
    assert got == [("X", False), ("Y", True)]


def test_validation_errors(spark, tmpdir_path):
    # parity: Type2ScdSpec.scala:69-124
    t0 = datetime.datetime(2019, 1, 1)
    t = _mk(
        spark,
        tmpdir_path,
        [(1, "A", True, t0, None)],
        "pkey int, attr string, is_current boolean, effective_time timestamp, end_time timestamp",
    )
    bad_updates = spark.createDataFrame([(1, "B")], "pkey int, attr string")
    with pytest.raises(JodieValidationError):
        type2_upsert(t, bad_updates, "pkey", ["attr"])

    bad_base = _mk(
        spark,
        tmpdir_path,
        [(1, "A")],
        "pkey int, attr string",
        name="bad_base",
    )
    updates = spark.createDataFrame(
        [(1, "B", t0)], "pkey int, attr string, effective_time timestamp"
    )
    with pytest.raises(JodieValidationError):
        type2_upsert(bad_base, updates, "pkey", ["attr"])


def test_streaming_scd2_sink_two_batches(spark, tmpdir_path):
    """Streaming Type-2 SCD: batch 1 creates the dimension, batch 2
    closes changed keys and inserts their new versions, no-op rows
    leave history untouched, and intra-batch multiple changes fold to
    the latest per key (merge sources must be key-unique)."""
    import os

    from jodie_spark.sources.datasource import register
    from jodie_spark.streaming.delta_sink import write_stream_scd2_to_delta
    from jodie_spark.tables.table import DeltaTable, write_delta

    register(spark)
    src = os.path.join(tmpdir_path, "scd_src")
    dim = os.path.join(tmpdir_path, "scd_dim")
    ckpt = os.path.join(tmpdir_path, "scd_ckpt")

    def run():
        q = write_stream_scd2_to_delta(
            spark.readStream.format("jodie_delta").load(src),
            dim,
            ckpt,
            primary_key="k",
            attr_cols=["city"],
            effective_time_col="eff",
            available_now=True,
        )
        q.awaitTermination(120)

    write_delta(
        spark.createDataFrame(
            [("A", "SFO", 1), ("B", "NYC", 1)], "k string, city string, eff int"
        ),
        src,
    )
    run()
    rows = {
        (r["k"], r["eff"]): (r["city"], r["is_current"], r["end_time"])
        for r in DeltaTable.forPath(spark, dim).toDF().collect()
    }
    assert rows == {
        ("A", 1): ("SFO", True, None),
        ("B", 1): ("NYC", True, None),
    }
    # batch 2: A moves twice (only eff=3 lands), B unchanged (no-op),
    # C is new
    write_delta(
        spark.createDataFrame(
            [("A", "LAX", 2), ("A", "SEA", 3), ("B", "NYC", 2), ("C", "CHI", 2)],
            "k string, city string, eff int",
        ),
        src,
        mode="append",
    )
    run()
    rows = {
        (r["k"], r["eff"]): (r["city"], r["is_current"], r["end_time"])
        for r in DeltaTable.forPath(spark, dim).toDF().collect()
    }
    assert rows == {
        ("A", 1): ("SFO", False, 3),
        ("A", 3): ("SEA", True, None),
        ("B", 1): ("NYC", True, None),
        ("C", 2): ("CHI", True, None),
    }
