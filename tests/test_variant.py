"""Variant data type (Delta table feature variantType, Spark 4 native
VariantType): create/read/DML on variant tables plus the foreign gate."""

import json
import os

import pytest

from jodie_spark.errors import DeltaProtocolError
from jodie_spark.tables.table import DeltaTable, write_delta


def _vdf(spark, n=6):
    return spark.sql(
        "select id, parse_json(concat('{\"a\": ', id, ', \"b\": \"x', id, '\"}')) as v "
        f"from range({n})"
    )


def test_variant_table_roundtrip_and_protocol(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "vt")
    write_delta(_vdf(spark), p)
    t = DeltaTable.forPath(spark, p)
    proto = t.snapshot().protocol
    assert "variantType" in proto["readerFeatures"]
    assert "variantType" in proto["writerFeatures"]
    assert proto["minReaderVersion"] == 3 and proto["minWriterVersion"] == 7
    # schemaString round-trips the type and values decode
    assert "variant" in t.snapshot().metadata["schemaString"]
    rows = sorted(
        (r["id"], r["a"])
        for r in t.toDF().selectExpr("id", "variant_get(v, '$.a', 'int') as a").collect()
    )
    assert rows == [(i, i) for i in range(6)]


def test_variant_table_dml_and_append(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "vt2")
    write_delta(_vdf(spark), p)
    write_delta(_vdf(spark).filter("id >= 4").selectExpr("id + 10 as id", "v"), p, mode="append")
    t = DeltaTable.forPath(spark, p)
    t.delete("id = 0")
    t.update("id = 1", {"v": "parse_json('{\"a\": 99}')"})
    got = {
        r["id"]: r["a"]
        for r in DeltaTable.forPath(spark, p)
        .toDF()
        .selectExpr("id", "variant_get(v, '$.a', 'int') as a")
        .collect()
    }
    assert 0 not in got
    assert got[1] == 99
    assert got[14] == 4 and got[15] == 5
    assert len(got) == 7


def test_datasource_refuses_variant_with_route(spark, tmpdir_path):
    from jodie_spark.sources.datasource import register

    p = os.path.join(tmpdir_path, "vds")
    write_delta(_vdf(spark, 3), p)
    register(spark)
    with pytest.raises(Exception, match="VARIANT"):
        spark.read.format("jodie_delta").load(p).collect()


def test_foreign_variant_feature_gate(spark, tmpdir_path):
    """A foreign table demanding variantType reads (we decode it); one
    demanding an unknown reader feature still refuses."""
    from tests.interop_golden import commit_info, part_name, write_commit
    from tests.test_interop import _meta

    # write real variant parquet with OUR writer, then wrap it in a
    # foreign-shaped log
    import shutil

    src = os.path.join(tmpdir_path, "varsrc")
    write_delta(_vdf(spark, 3).coalesce(1), src)
    data_file = next(
        f for f in os.listdir(src) if f.endswith(".parquet")
    )
    t = os.path.join(tmpdir_path, "foreign_variant")
    os.makedirs(t)
    shutil.copy(os.path.join(src, data_file), os.path.join(t, data_file))
    schema_string = DeltaTable.forPath(spark, src).snapshot().metadata["schemaString"]
    meta = _meta([("id", "long")])
    meta["metaData"]["schemaString"] = schema_string
    write_commit(
        t,
        0,
        [
            commit_info("WRITE", {"mode": "ErrorIfExists", "partitionBy": "[]"}),
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["variantType"],
                    "writerFeatures": ["variantType"],
                }
            },
            meta,
            {
                "add": {
                    "path": data_file,
                    "partitionValues": {},
                    "size": os.path.getsize(os.path.join(t, data_file)),
                    "modificationTime": 0,
                    "dataChange": True,
                }
            },
        ],
    )
    rows = sorted(
        (r["id"], r["a"])
        for r in DeltaTable.forPath(spark, t)
        .toDF()
        .selectExpr("id", "variant_get(v, '$.a', 'int') as a")
        .collect()
    )
    assert rows == [(0, 0), (1, 1), (2, 2)]

    # unknown reader feature still refuses
    bad = os.path.join(tmpdir_path, "foreign_unknown")
    os.makedirs(os.path.join(bad, "_delta_log"))
    with open(os.path.join(bad, "_delta_log", "%020d.json" % 0), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["someFutureFeature"], "writerFeatures": [],
        }}) + "\n")
        fh.write(json.dumps(_meta([("id", "long")])) + "\n")
    with pytest.raises(DeltaProtocolError, match="someFutureFeature"):
        DeltaTable.forPath(spark, bad).snapshot()
