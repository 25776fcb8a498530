"""Ports of reference DeltaHelperSpec utility tests (md5 goldens,
humanize, file sizes, composite keys, validate_append, copy_table)."""

import os

import pytest

from jodie_spark.errors import JodieValidationError
from jodie_spark.operators import (
    copy_table,
    delta_file_sizes,
    find_composite_key_candidate,
    get_storage_location,
    humanize_bytes,
    is_composite_key_candidate,
    latest_version,
    validate_append,
    with_md5_columns,
)
from jodie_spark.tables.table import DeltaTable, write_delta

PEOPLE = [(1, "Benito", "Jackson"), (2, "Maria", "Willis"), (3, "Jose", "Travolta")]
PEOPLE_COLS = ["id", "firstname", "lastname"]


def _people_df(spark):
    return spark.createDataFrame(PEOPLE, PEOPLE_COLS)


def _people_table(spark, tmpdir_path, name="t"):
    path = os.path.join(tmpdir_path, name)
    write_delta(_people_df(spark), path)
    return DeltaTable.forPath(spark, path)


def test_md5_golden_hashes_dataframe(spark):
    # golden values: reference DeltaHelperSpec.scala:750-754
    out = with_md5_columns(_people_df(spark), ["firstname", "lastname"], "unique_column")
    got = {r["id"]: r["unique_column"] for r in out.collect()}
    assert got == {
        1: "3456d6842080e8188b35f515254fece8",
        2: "4fd906b56cc15ca517c554b215597ea1",
        3: "3b3814001b13695931b6df8670172f91",
    }


def test_md5_golden_hashes_delta_table(spark, tmpdir_path):
    # golden values: reference DeltaHelperSpec.scala:781-785
    t = _people_table(spark, tmpdir_path)
    out = with_md5_columns(t, ["id", "firstname", "lastname"], "unique_id")
    got = {r["id"]: r["unique_id"] for r in out.collect()}
    assert got == {
        1: "cad17f15341ed95539e098444a4c8050",
        2: "3e1e9709234c6250c74241d5886d5073",
        3: "1f1ac7f74f43eff911a92f7e28069271",
    }


def test_md5_default_column_name(spark):
    out = with_md5_columns(_people_df(spark), ["firstname", "lastname"])
    assert "_md5firstnamelastname" in out.columns


def test_humanize_bytes_unit_switch_at_point_nine():
    # quirk: unit switches at 0.9×unit (DeltaHelpers.scala:530-537)
    assert humanize_bytes(0.0) == "0 B"
    assert humanize_bytes(899.0) == "899 B"
    assert humanize_bytes(900.0) == "0.90 kB"
    assert humanize_bytes(1088.0) == "1.09 kB"
    assert humanize_bytes(2.5e9) == "2.50 GB"
    assert humanize_bytes(1e15) == "1.00 PB"


def test_delta_file_sizes(spark, tmpdir_path):
    t = _people_table(spark, tmpdir_path)
    sizes = delta_file_sizes(t)
    assert sizes["number_of_files"] >= 1
    assert sizes["size_in_bytes"] > 0
    assert sizes["average_file_size_in_bytes"] == sizes["size_in_bytes"] // sizes[
        "number_of_files"
    ]


def test_show_delta_file_sizes_output(spark, tmpdir_path, capsys):
    from jodie_spark.operators import show_delta_file_sizes

    t = _people_table(spark, tmpdir_path)
    show_delta_file_sizes(t)
    out = capsys.readouterr().out
    assert "The delta table contains" in out and "average file size" in out


def test_storage_location_and_latest_version(spark, tmpdir_path):
    t = _people_table(spark, tmpdir_path)
    assert get_storage_location(t) == t.path
    assert latest_version(spark, t.path) == 0


def test_composite_key_candidates(spark, tmpdir_path):
    t = _people_table(spark, tmpdir_path)
    assert find_composite_key_candidate(t, ["id"]) == ["firstname"]
    assert is_composite_key_candidate(t, ["id"]) is True
    with pytest.raises(ValueError):
        is_composite_key_candidate(t, [])
    with pytest.raises(ValueError):
        is_composite_key_candidate(t, ["nope"])


def test_validate_append_allows_optional_and_rejects_unknown(spark, tmpdir_path):
    t = _people_table(spark, tmpdir_path)
    ok = spark.createDataFrame([(4, "Yadi", "Molina", "PR")], PEOPLE_COLS + ["country"])
    validate_append(t, ok, ["id", "firstname", "lastname"], ["country"])
    assert DeltaTable.forPath(spark, t.path).toDF().count() == 4

    bad = spark.createDataFrame([(5, "X", "Y", 1.0)], PEOPLE_COLS + ["salary"])
    with pytest.raises(JodieValidationError):
        validate_append(t, bad, ["id", "firstname", "lastname"], ["country"])

    missing = spark.createDataFrame([("a",)], ["firstname"])
    with pytest.raises(JodieValidationError):
        validate_append(t, missing, ["id", "firstname", "lastname"], [])


def test_copy_table_copies_data_partitions_properties(spark, tmpdir_path):
    src_path = os.path.join(tmpdir_path, "src")
    write_delta(
        _people_df(spark), src_path, partition_by=["lastname"], options={"foo": "bar"}
    )
    src = DeltaTable.forPath(spark, src_path)
    dst_path = os.path.join(tmpdir_path, "dst")
    copy_table(src, target_path=dst_path)
    dst = DeltaTable.forPath(spark, dst_path)
    assert sorted(tuple(r) for r in dst.toDF().select(*PEOPLE_COLS).collect()) == sorted(
        PEOPLE
    )
    detail = dst.detail().collect()[0]
    assert detail["partitionColumns"] == ["lastname"]
    assert detail["properties"].get("foo") == "bar"
    with pytest.raises(JodieValidationError):
        copy_table(src)
    with pytest.raises(JodieValidationError):
        copy_table(src, target_path="x", target_table_name="y")


def test_copy_table_registers_readable_name(spark, tmpdir_path):
    """copy_table(target_table_name=...) must yield a name that
    spark.table() and DeltaTable.forName() resolve (reference
    DeltaHelpers.scala:409-424 registers a metastore table)."""
    import shutil
    import uuid

    from jodie_spark.catalog import refresh_table, resolve_table_path, unregister_table
    from jodie_spark.tables.table import DeltaTable, write_delta

    src = os.path.join(tmpdir_path, "cat_src")
    write_delta(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]), src)
    name = f"copied_{uuid.uuid4().hex[:8]}"
    copy_table(DeltaTable.forPath(spark, src), target_table_name=name)

    assert sorted(tuple(r) for r in spark.table(name).collect()) == [(1, "a"), (2, "b")]
    assert spark.sql(f"select count(*) n from {name}").collect()[0]["n"] == 2

    t = DeltaTable.forName(spark, name)
    t.delete("k = 1")
    refresh_table(spark, name)  # views capture a snapshot; refresh after DML
    assert [tuple(r) for r in spark.table(name).collect()] == [(2, "b")]
    copied_path = resolve_table_path(name)
    unregister_table(spark, name)
    shutil.rmtree(copied_path, ignore_errors=True)
