"""Persisted hamming-band index (operators/hamming_index.py): recall
guarantee inside the pigeonhole radius, append lifecycle, geometry
self-description, partial-recall warning, and the corpus-never-
shuffles probe plan."""

import os

import pytest
from pyspark.sql import functions as F

from jodie_spark.operators.hamming_index import (
    append_to_hamming_index,
    build_hamming_index,
    hamming_index_filter_new,
    query_hamming_index,
)


def _hashes(spark, rows):
    return spark.createDataFrame(rows, "id long, h long")


def test_exact_and_near_matches_within_radius(spark, tmpdir_path):
    idx = os.path.join(tmpdir_path, "hidx")
    base = 0x0123456789ABCDEF
    corpus = _hashes(spark, [(1, base), (2, base ^ (0xFF << 32)), (3, -42)])
    build_hamming_index(corpus, "h", "id", idx, bands=4)
    batch = _hashes(
        spark,
        [
            (101, base),                    # exact: hamming 0
            (102, base ^ 0b101),            # hamming 2
            (103, base ^ 0b111000111),      # hamming 6: beyond radius 3
            (104, 0x7EADBEEF00000000),      # unrelated
        ],
    )
    m = query_hamming_index(spark, idx, batch, "h", "id", max_hamming=3)
    got = {(r["new_id"], r["index_id"], r["hamming"]) for r in m.collect()}
    assert got == {(101, 1, 0), (102, 1, 2)}
    kept = hamming_index_filter_new(spark, idx, batch, "h", "id", max_hamming=3)
    assert sorted(r["id"] for r in kept.collect()) == [103, 104]


def test_pigeonhole_recall_guarantee(spark, tmpdir_path):
    """Every pair at hamming <= bands-1 MUST be found: flip any 3 bits
    of an 8-band index (guaranteed radius 7) and the match survives."""
    idx = os.path.join(tmpdir_path, "hidx8")
    base = 0x5A5A5A5A5A5A5A5A
    build_hamming_index(_hashes(spark, [(1, base)]), "h", "id", idx, bands=8)
    probes = []
    flips = [(0, 9, 33), (1, 2, 3), (61, 62, 63), (5, 21, 47)]
    for j, bits in enumerate(flips):
        h = base
        for b in bits:
            h ^= 1 << b
        if h >= 1 << 63:  # wrap to signed 64-bit (LongType range)
            h -= 1 << 64
        probes.append((100 + j, h))
    m = query_hamming_index(
        spark, idx, _hashes(spark, probes), "h", "id", max_hamming=7
    )
    assert m.count() == len(flips)  # none missed


def test_append_and_geometry_validation(spark, tmpdir_path):
    idx = os.path.join(tmpdir_path, "hgrow")
    build_hamming_index(_hashes(spark, [(1, 111)]), "h", "id", idx)
    append_to_hamming_index(_hashes(spark, [(2, 222)]), "h", "id", idx)
    m = query_hamming_index(
        spark, idx, _hashes(spark, [(10, 111), (11, 222)]), "h", "id", 0
    )
    assert {(r["new_id"], r["index_id"]) for r in m.collect()} == {(10, 1), (11, 2)}
    with pytest.raises(ValueError, match="must divide 64"):
        build_hamming_index(_hashes(spark, [(1, 1)]), "h", "id",
                            os.path.join(tmpdir_path, "bad"), bands=5)
    with pytest.raises(ValueError, match="not a hamming index"):
        from jodie_spark.tables.table import write_delta

        other = os.path.join(tmpdir_path, "plain")
        write_delta(_hashes(spark, [(1, 1)]), os.path.join(other, "postings"))
        query_hamming_index(spark, other, _hashes(spark, [(1, 1)]), "h", "id")


def test_partial_recall_radius_warns(spark, tmpdir_path):
    idx = os.path.join(tmpdir_path, "hwarn")
    build_hamming_index(_hashes(spark, [(1, 0)]), "h", "id", idx, bands=4)
    with pytest.warns(UserWarning, match="pigeonhole"):
        query_hamming_index(
            spark, idx, _hashes(spark, [(2, 1)]), "h", "id", max_hamming=5
        )


def test_probe_plan_corpus_side_never_shuffles(spark, tmpdir_path):
    idx = os.path.join(tmpdir_path, "hplan")
    build_hamming_index(
        _hashes(spark, [(i, i * 7919) for i in range(100)]), "h", "id", idx
    )
    m = query_hamming_index(
        spark, idx, _hashes(spark, [(1000 + i, i * 104729) for i in range(10)]),
        "h", "id", 3,
    )
    plan = m._jdf.queryExecution().executedPlan().toString()
    shuffles = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "Broadcast" not in ln
    ]
    assert all("new_id" in ln for ln in shuffles), plan  # only the final distinct
    assert "SortMergeJoin" not in plan, plan
