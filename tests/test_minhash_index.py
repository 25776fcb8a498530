"""Persisted MinHash-LSH index (operators/minhash_index.py): build /
probe / append lifecycle, self-describing geometry, and the
corpus-never-shuffles probe plan. Extends the exact-identity
incremental dedup family (dedup_against, bloom) with the fuzzy probe
a recurring-crawl pipeline needs."""

import os

import pytest
from pyspark.sql import functions as F

from jodie_spark.operators.minhash_index import (
    append_to_minhash_index,
    build_minhash_index,
    minhash_index_filter_new,
    query_minhash_index,
)


def _docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )


@pytest.fixture()
def index(spark, tmpdir_path):
    idx = os.path.join(tmpdir_path, "mhidx")
    build_minhash_index(_docs(spark).filter("doc_id % 2 = 0"), "text", "doc_id", idx)
    return idx


def test_probe_finds_exact_and_fuzzy_clones(spark, index):
    corpus = _docs(spark).filter("doc_id % 2 = 0")
    clones = corpus.filter("doc_id % 10 = 0").select(
        (F.col("doc_id") + 100_000).alias("doc_id"), "text"
    )
    m = query_minhash_index(spark, index, clones, "text", "doc_id", threshold=1.0)
    got = {(r["new_id"], r["index_id"]) for r in m.collect()}
    # every planted clone matches its original (agreement 1.0) —
    # fixture duplicates may add extra true matches, never miss one
    assert all((i + 100_000, i) in got for i in
               [r["doc_id"] for r in corpus.filter("doc_id % 10 = 0").collect()])
    assert all(r["est_jaccard"] == 1.0 for r in m.collect())
    # a fuzzy clone (a few words changed) still matches at 0.5
    fuzzy = corpus.filter("doc_id % 10 = 0").select(
        (F.col("doc_id") + 200_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" trailing marker words appended")).alias("text"),
    )
    mf = query_minhash_index(spark, index, fuzzy, "text", "doc_id", threshold=0.5)
    pairs = {(r["new_id"] - 200_000, r["index_id"]) for r in mf.collect()}
    # every fuzzy clone must match its own original...
    assert {a for a, b in pairs if a == b} == {
        r["doc_id"] for r in corpus.filter("doc_id % 10 = 0").collect()
    }
    # ...and any cross-match must be a genuine near-dup (fixture
    # duplicates), verified by true text overlap, not trusted blindly
    cross = {(a, b) for a, b in pairs if a != b}
    if cross:
        texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
        for a, b in cross:
            sa = set(texts[a].split()) if a in texts else None
            assert sa is None or len(sa & set(texts[b].split())) > 0, (a, b)


def test_filter_new_drops_only_matches(spark, index):
    corpus = _docs(spark).filter("doc_id % 2 = 0")
    clones = corpus.filter("doc_id % 10 = 0").select(
        (F.col("doc_id") + 100_000).alias("doc_id"), "text"
    )
    batch = _docs(spark).filter("doc_id % 2 = 1").unionByName(clones)
    kept = minhash_index_filter_new(spark, index, batch, "text", "doc_id", 1.0)
    matched = query_minhash_index(spark, index, batch, "text", "doc_id", 1.0)
    assert kept.count() == batch.count() - matched.select("new_id").distinct().count()
    # no kept row is a clone (every clone matches its original)
    assert kept.filter("doc_id >= 100000").count() == 0


def test_append_grows_index_without_rebuild(spark, index):
    odd = _docs(spark).filter("doc_id % 2 = 1")
    before = query_minhash_index(spark, index, odd.limit(20), "text", "doc_id", 1.0)
    n_before = before.filter("new_id = index_id").count()
    assert n_before == 0  # odd ids not indexed yet
    append_to_minhash_index(odd, "text", "doc_id", index)
    after = query_minhash_index(spark, index, odd.limit(20), "text", "doc_id", 1.0)
    assert after.filter("new_id = index_id").count() == 20  # self-match


def test_geometry_is_self_describing_and_validated(spark, tmpdir_path):
    idx = os.path.join(tmpdir_path, "geo")
    with pytest.raises(ValueError, match="must divide"):
        build_minhash_index(_docs(spark), "text", "doc_id", idx, num_hashes=60, bands=16)
    build_minhash_index(
        _docs(spark).filter("doc_id < 50"), "text", "doc_id", idx,
        num_hashes=32, bands=8,
    )
    # probe recomputes with the PERSISTED geometry: self-match works
    # (deterministic id filters — an unordered limit() could probe
    # rows outside the indexed set)
    m = query_minhash_index(
        spark, idx, _docs(spark).filter("doc_id < 5"), "text", "doc_id",
        threshold=1.0,
    )
    assert m.filter("new_id = index_id").count() == 5
    with pytest.raises(ValueError, match="threshold"):
        query_minhash_index(spark, idx, _docs(spark), "text", "doc_id", threshold=0.0)
    with pytest.raises(ValueError, match="not a minhash index"):
        from jodie_spark.tables.table import write_delta

        other = os.path.join(tmpdir_path, "plain")
        write_delta(_docs(spark).limit(1), os.path.join(other, "postings"))
        query_minhash_index(spark, other, _docs(spark), "text", "doc_id")


def test_probe_plan_corpus_side_never_shuffles(spark, index):
    """Scale contract: the POSTINGS scan joins against broadcast batch
    keys (no corpus shuffle), there is no cartesian product, and in
    the common small-candidate case AQE resolves the verify join to a
    broadcast at runtime — the only surviving non-broadcast exchanges
    key on the candidate/match set (new_id), never on raw postings."""
    m = query_minhash_index(
        spark, index, _docs(spark).filter("doc_id % 2 = 1"), "text", "doc_id", 0.9
    )
    m.collect()  # run so AQE finalizes its join choices
    plan = m._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastExchange" in plan, plan  # batch keys broadcast
    shuffles = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "Broadcast" not in ln
    ]
    assert all("new_id" in ln for ln in shuffles), plan
