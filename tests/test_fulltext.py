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


# ---------------------------------------------------------------------------
# vocabulary encoding
# ---------------------------------------------------------------------------

def test_build_vocab_deterministic_ranking(spark):
    from jodie_spark.operators.tokenize import build_vocab

    df = spark.createDataFrame(
        [(1, "b a a c b a"), (2, "c b")], ["doc_id", "text"]
    )
    vocab = {r["token"]: (r["token_id"], r["n_occurrences"]) for r in build_vocab(df).collect()}
    # a:3, b:3, c:2 — count desc then token asc
    assert vocab == {"a": (1, 3), "b": (2, 3), "c": (3, 2)}
    small = {r["token"] for r in build_vocab(df, max_size=2).collect()}
    assert small == {"a", "b"}
    filtered = {r["token"] for r in build_vocab(df, min_count=3).collect()}
    assert filtered == {"a", "b"}


def test_encode_decode_roundtrip_with_unk(spark):
    from jodie_spark.operators.tokenize import build_vocab, decode_token_ids, encode_documents

    train = spark.createDataFrame([(0, "a b c a b a")], ["doc_id", "text"])
    vocab = build_vocab(train)
    test = spark.createDataFrame(
        [(1, "a zzz b"), (2, "  ")], ["doc_id", "text"]
    )
    enc = {r["doc_id"]: r for r in encode_documents(test, vocab, "text", "doc_id").collect()}
    assert enc[1]["token_ids"] == [1, 0, 2]  # a=1, UNK=0, b=2
    assert enc[1]["n_tokens"] == 3 and enc[1]["n_unk"] == 1
    assert enc[2]["token_ids"] == [] and enc[2]["n_tokens"] == 0
    dec = {r["doc_id"]: r["text"] for r in decode_token_ids(
        encode_documents(test, vocab, "text", "doc_id").filter("n_tokens > 0"), vocab
    ).collect()}
    assert dec[1] == "a <unk> b"


def test_encode_exploded_form_order(spark):
    from jodie_spark.operators.tokenize import build_vocab, encode_documents

    df = spark.createDataFrame([(7, "c b a")], ["doc_id", "text"])
    vocab = build_vocab(df)
    rows = sorted(
        (r["pos"], r["token"], r["token_id"])
        for r in encode_documents(df, vocab, "text", "doc_id", exploded=True).collect()
    )
    assert rows == [(0, "c", 3), (1, "b", 2), (2, "a", 1)]


def test_encode_plan_no_python_and_broadcast(spark):
    from jodie_spark.operators.tokenize import build_vocab, encode_documents

    df = spark.createDataFrame([(i, "a b c") for i in range(10)], ["doc_id", "text"])
    vocab = build_vocab(df).localCheckpoint()
    plan = (
        encode_documents(df, vocab, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
