"""Exact substring dedup (Lee et al. 2022): corpus-wide duplicated
window removal, keeper election, and the plan contract."""

import pytest
from pyspark.sql import functions as F

from jodie_spark.operators.substring_dedup import (
    duplicate_window_stats,
    remove_duplicate_substrings,
)

BOILER = " ".join(f"b{i}" for i in range(15))


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "alpha beta " + BOILER + " gamma"),
        (2, "unique words only here"),
        (3, BOILER + " tail tokens"),
        (4, "prefix " + BOILER),
        (5, "   "),
        (6, "short doc"),
        (7, BOILER),  # exactly one window, fully covered
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_keeper_is_first_occurrence_and_others_are_removed(corpus):
    out = {
        r["doc_id"]: (r["text"], r["n_tokens_removed"])
        for r in remove_duplicate_substrings(corpus, window=15).collect()
    }
    # doc 1 is the (doc_id, pos)-first occurrence: untouched
    assert out[1] == ("alpha beta " + BOILER + " gamma", 0)
    assert out[2] == ("unique words only here", 0)
    assert out[3] == ("tail tokens", 15)
    assert out[4] == ("prefix", 15)
    assert out[5] == ("", 0)  # blank doc normalizes to empty
    assert out[6] == ("short doc", 0)  # below window size: untouched
    assert out[7] == ("", 15)  # fully-duplicated doc empties out


def test_overlapping_windows_remove_long_span_once(spark):
    """A duplicated span LONGER than the window is covered by its
    overlapping windows — the whole span goes, not just the first W
    tokens, and tokens outside it survive."""
    span = " ".join(f"s{i}" for i in range(25))  # 25-token duplicated span
    df = spark.createDataFrame(
        [(1, "intro " + span + " outro"), (2, "pre " + span + " post")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["text"], r["n_tokens_removed"])
        for r in remove_duplicate_substrings(df, window=15).collect()
    }
    assert out[1][1] == 0
    assert out[2] == ("pre post", 25)


def test_within_document_repeats_keep_first(spark):
    df = spark.createDataFrame(
        [(1, BOILER + " middle " + BOILER)], "doc_id long, text string"
    )
    out = remove_duplicate_substrings(df, window=15).collect()[0]
    assert out["text"] == BOILER + " middle"
    assert out["n_tokens_removed"] == 15


def test_stats_and_hash_fn_agree(corpus):
    stats_x = {
        r["doc_id"]: (r["n_windows"], r["n_duplicate_windows"])
        for r in duplicate_window_stats(corpus, window=15, hash_fn="xxhash64").collect()
    }
    stats_m = {
        r["doc_id"]: (r["n_windows"], r["n_duplicate_windows"])
        for r in duplicate_window_stats(corpus, window=15, hash_fn="md5").collect()
    }
    assert stats_x == stats_m  # hash choice changes bytes, not results
    assert stats_x[1] == (4, 0)  # keeper doc: windows present, none removed
    assert stats_x[3] == (3, 1)
    assert stats_x[7] == (1, 1)
    with pytest.raises(ValueError, match="hash_fn"):
        duplicate_window_stats(corpus, hash_fn="sha1").collect()


def _brute_force(rows, window):
    """Independent python reference: same election, different shape."""
    from collections import defaultdict

    toks = {d: t.split() for d, t in rows if t.strip()}
    occ = defaultdict(list)
    for d in sorted(toks):
        w = toks[d]
        for i in range(len(w) - window + 1):
            occ[" ".join(w[i : i + window])].append((d, i))
    covered = defaultdict(set)
    for positions in occ.values():
        if len(positions) > 1:
            for d, i in sorted(positions)[1:]:
                covered[d].update(range(i, i + window))
    out = {}
    for d, _t in rows:
        w = toks.get(d, [])
        kept = [t for i, t in enumerate(w) if i not in covered[d]]
        out[d] = (" ".join(kept), len(w) - len(kept))
    return out


def test_matches_brute_force_on_random_corpora(spark):
    """Randomized corpora with planted shared phrases: the distributed
    pipeline must agree with an independent in-memory implementation."""
    import random

    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(30)]
    shared = [" ".join(rng.choice(vocab) for _ in range(6)) for _ in range(3)]
    rows = []
    for d in range(12):
        parts = []
        for _ in range(rng.randint(0, 4)):
            parts.append(
                rng.choice(shared)
                if rng.random() < 0.5
                else " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 8)))
            )
        rows.append((d, " ".join(parts)))
    window = 5
    expected = _brute_force(rows, window)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_tokens_removed"])
        for r in remove_duplicate_substrings(df, window=window).collect()
    }
    assert got == expected


def test_plan_no_cartesian_no_python(corpus):
    q = remove_duplicate_substrings(corpus, window=15)
    plan = q._jdf.queryExecution().executedPlan().toString()
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin",
                "BatchEvalPython", "FlatMapGroupsInPandas", "ArrowEvalPython"):
        assert bad not in plan, plan
