"""Full-text search: postings, inverted index, keyword search, BM25."""

import math

import pytest


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick red fox"),
    (2, "a lazy dog sleeps"),
    (3, "brown bears eat fish"),
    (4, ""),
    (5, "dog dog dog"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_term_postings(docs):
    from jodie_spark.operators.fulltext import term_postings

    rows = {
        (r["term"], r["doc_id"]): r["tf"]
        for r in term_postings(docs).collect()
    }
    assert rows[("the", 0)] == 2
    assert rows[("dog", 5)] == 3
    assert rows[("fox", 1)] == 1
    assert ("", 4) not in rows and ("", 0) not in rows


def test_inverted_index_postings_sorted(docs):
    from jodie_spark.operators.fulltext import build_inverted_index

    idx = {r["term"]: r for r in build_inverted_index(docs).collect()}
    dog = idx["dog"]
    assert dog["df"] == 3 and dog["total_tf"] == 5
    assert [p["doc_id"] for p in dog["postings"]] == [0, 2, 5]
    assert 0 <= idx["fox"]["bucket"] < 256


def test_keyword_search_modes(docs):
    from jodie_spark.operators.fulltext import keyword_search

    both = {r["doc_id"] for r in keyword_search(docs, "lazy dog").collect()}
    assert both == {0, 2}
    either = {
        r["doc_id"]: r["n_matched"]
        for r in keyword_search(docs, "lazy dog", mode="any").collect()
    }
    assert either == {0: 2, 2: 2, 5: 1}
    with pytest.raises(ValueError):
        keyword_search(docs, "lazy", mode="fuzzy")
    with pytest.raises(ValueError):
        keyword_search(docs, "!!!")


def test_bm25_hand_computed(docs):
    """Single-term query against a hand-evaluated BM25 formula."""
    from jodie_spark.operators.fulltext import bm25_topk

    got = {r["doc_id"]: r["score"] for r in bm25_topk(docs, "dog", 10).collect()}
    n, dft = 6, 3
    idf = math.log(1 + (n - dft + 0.5) / (dft + 0.5))
    lens = [9, 4, 4, 4, 0, 3]
    avgdl = sum(lens) / n

    def w(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    expect = {0: w(1, 9), 2: w(1, 4), 5: w(3, 3)}
    assert set(got) == set(expect)
    for d, s in expect.items():
        assert got[d] == pytest.approx(s, abs=1e-6)
    # tf saturation + length normalization: doc 5 (tf=3, short) must
    # outrank doc 2 (tf=1) which outranks the long doc 0
    ranked = sorted(got, key=lambda d: -got[d])
    assert ranked == [5, 2, 0]


def test_bm25_multi_term_and_ties(docs):
    from jodie_spark.operators.fulltext import bm25_topk

    rows = bm25_topk(docs, "quick fox bears", 3).collect()
    assert [r["doc_id"] for r in rows] == sorted(
        [r["doc_id"] for r in rows], key=lambda d: (-dict((x["doc_id"], x["score"]) for x in rows)[d], d)
    )
    # doc 1 matches quick+fox with the shortest length → best score
    assert rows[0]["doc_id"] == 1
    with pytest.raises(ValueError):
        bm25_topk(docs, "   ")


def test_query_tokenizer_matches_words_semantics(spark):
    from jodie_spark.operators.fulltext import tokenize_query

    assert tokenize_query("Merge, SCAN! 42 re-merge") == ["merge", "scan", "re"]
    assert tokenize_query("") == []


def test_bm25_plan_is_take_ordered(docs):
    """Top-k must plan as TakeOrderedAndProject, not a global sort."""
    from jodie_spark.operators.fulltext import bm25_topk

    plan = bm25_topk(docs, "dog fox", 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
