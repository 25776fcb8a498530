"""Guards added in optimization round 14 (VERDICT r13 items 3-4):
stale caller-owned snapshots are rejected in strict mode, and
``_banded`` survives column names containing backticks."""

import os

import pytest

from jodie_spark.errors import JodieValidationError
from jodie_spark.tables.table import DeltaTable, write_delta


def test_stale_snapshot_rejected_in_strict_mode(spark, tmpdir_path, monkeypatch):
    path = os.path.join(tmpdir_path, "t")
    write_delta(spark.range(10).selectExpr("id", "id % 3 as k"), path)
    t = DeltaTable.forPath(spark, path)
    snap = t.snapshot()
    t.delete("k = 1")  # mutate: snap is now stale
    monkeypatch.setenv("JODIE_STRICT_SNAPSHOT", "1")
    with pytest.raises(JodieValidationError, match="stale _snapshot"):
        t.toDF(_snapshot=snap).count()
    # a fresh snapshot passes the guard
    assert t.toDF(_snapshot=t.snapshot()).count() == 7
    # and without strict mode the (documented, caller-owned) reuse still works
    monkeypatch.delenv("JODIE_STRICT_SNAPSHOT")
    t.toDF(_snapshot=snap)


def test_banded_escapes_backticked_column_names(spark):
    from jodie_spark.operators.text_dedup import _banded

    df = spark.range(4).selectExpr(
        "id", "array(id, id + 1, id + 2, id + 3) as `si``g`"
    )
    rows = df.select(_banded("si`g", num_hashes=4, bands=2).alias("b")).collect()
    assert len(rows) == 4
    assert all(len(r.b) == 2 for r in rows)
