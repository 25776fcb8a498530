"""Tests for cross-document passage duplication (operators/passage_dedup.py)."""

from pyspark.sql import functions as F

BOILER = "all rights reserved contact us for terms of service details"  # 10 tokens


def _docs(spark):
    rows = [
        (1, "unique prose about mountains rivers and the quiet morning light here"),
        (2, f"first article body text {BOILER}"),
        (3, f"second article other words {BOILER}"),
        (4, "short doc"),  # < k tokens -> no windows
        (5, "repeat repeat repeat repeat repeat repeat repeat repeat repeat repeat"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_window_hashes_shape_and_determinism(spark):
    from jodie_spark.operators.passage_dedup import passage_window_hashes

    df = _docs(spark)
    w = passage_window_hashes(df, k=8)
    rows = w.filter(F.col("doc_id") == 1).collect()
    assert len(rows) == 11 - 8 + 1  # n_tokens - k + 1
    assert [r["pos"] for r in sorted(rows, key=lambda r: r["pos"])] == [1, 2, 3, 4]
    again = passage_window_hashes(df, k=8).filter(F.col("doc_id") == 1).collect()
    assert {(r["pos"], r["whash"]) for r in rows} == {(r["pos"], r["whash"]) for r in again}
    # doc 4 has < 8 tokens -> no windows
    assert w.filter(F.col("doc_id") == 4).count() == 0


def test_dup_passage_stats(spark):
    from jodie_spark.operators.passage_dedup import dup_passage_stats

    stats = {r["doc_id"]: r for r in dup_passage_stats(_docs(spark), k=8).collect()}
    assert set(stats) == {1, 2, 3, 4, 5}
    assert stats[1]["dup_fraction"] == 0.0
    # docs 2 and 3 share the 10-token boilerplate -> 3 shared windows each
    assert stats[2]["n_dup_windows"] == 3 and stats[3]["n_dup_windows"] == 3
    assert 0 < stats[2]["dup_fraction"] < 1
    assert stats[4]["n_windows"] == 0 and stats[4]["dup_fraction"] == 0.0
    # doc 5: every window is the same hash, repeated within one doc
    assert stats[5]["dup_fraction"] == 1.0


def test_passage_filter_keeps_columns_and_drops_dups(spark):
    from jodie_spark.operators.passage_dedup import passage_filter

    df = _docs(spark)
    kept = passage_filter(df, k=8, max_dup_fraction=0.2)
    assert kept.columns == df.columns
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 1 in ids and 4 in ids and 5 not in ids
    assert 2 not in ids and 3 not in ids


def test_no_text_in_shuffle(spark):
    """The exchanges must carry (id, pos, hash) longs — never the text
    or the gram strings."""
    from jodie_spark.operators.passage_dedup import dup_passage_stats

    plan = (
        dup_passage_stats(_docs(spark), k=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # shuffles partition on the hash / id longs, never the gram or text
    assert "Exchange hashpartitioning(whash" in plan
    assert "Exchange hashpartitioning(__g__" not in plan
    assert "Exchange hashpartitioning(text" not in plan
