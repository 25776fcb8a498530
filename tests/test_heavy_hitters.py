"""Exact heavy hitters (Misra-Gries prefilter + exact recount): the
candidate pass may only ever prune values that CANNOT exceed the
threshold, so the final output must equal the brute-force SQL answer on
any distribution — including adversarial ones built to starve the
k-counter summary."""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from jodie_spark.operators.heavy_hitters import heavy_hitters, token_heavy_hitters


def _exact(values, phi):
    c = Counter(v for v in values if v is not None)
    n = sum(c.values())
    return {v: k for v, k in c.items() if k > phi * n}


def _check(spark, values, phi, partitions=8):
    df = spark.createDataFrame([(v,) for v in values], "value string").repartition(
        partitions
    )
    got = {r["value"]: r["cnt"] for r in heavy_hitters(df, "value", phi).collect()}
    assert got == _exact(values, phi)


def test_simple_skew(spark):
    vals = ["a"] * 50 + ["b"] * 30 + [f"x{i}" for i in range(120)]
    _check(spark, vals, phi=0.10)


def test_adversarial_long_tail(spark):
    """A huge distinct tail engineered to force constant MG decrements:
    the true heavy hitter must still survive every partition summary
    and the recount must be exact."""
    rng = random.Random(7)
    vals = ["hot"] * 400 + [f"t{rng.randrange(10_000)}" for _ in range(3_600)]
    rng.shuffle(vals)
    _check(spark, vals, phi=0.05, partitions=16)


def test_threshold_boundary_is_strict(spark):
    """count == phi*N exactly must NOT qualify (strict >), matching the
    SQL HAVING count(*) > phi * n oracle."""
    # "a" has exactly 10 of 100 rows; phi=0.10 → excluded
    vals = ["a"] * 10 + [f"u{i}" for i in range(90)]
    _check(spark, vals, phi=0.10)
    assert _exact(vals, 0.10) == {}


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), (None,), (None,), ("b",)], "value string"
    )
    got = {r["value"]: r["cnt"] for r in heavy_hitters(df, "value", 0.5).collect()}
    # N = 4 non-null rows; only "a" (3) exceeds 2.0
    assert got == {"a": 3}


def test_empty_input(spark):
    df = spark.createDataFrame([], "value string")
    assert heavy_hitters(df, "value", 0.1).collect() == []


def test_phi_validation(spark):
    df = spark.createDataFrame([("a",)], "value string")
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters(df, "value", 0.0)
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters(df, "value", 1.0)


def test_token_heavy_hitters_matches_frequencies(spark):
    """The convenience wrapper agrees with an explode+groupBy count."""
    docs = spark.createDataFrame(
        [("the cat and the dog and the bird",), ("the end and more",)],
        "text string",
    )
    got = {r["token"]: r["cnt"] for r in token_heavy_hitters(docs, phi=0.2).collect()}
    toks = [
        t
        for row in docs.collect()
        for t in row["text"].lower().split()
    ]
    assert got == _exact(toks, 0.2)


def test_recount_join_is_broadcast(spark):
    """Plan contract: the candidate recount must be a broadcast semi
    join (candidates are bounded by partitions x k) — a sort-merge join
    here would shuffle the corpus on the value column."""
    df = spark.createDataFrame([(f"v{i % 5}",) for i in range(100)], "value string")
    plan = heavy_hitters(df, "value", 0.1)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_grouped_heavy_hitters(spark):
    """Per-group φ: each group's hitters judged against ITS row count;
    exact vs brute force on an adversarial mixed distribution."""
    rng = random.Random(11)
    rows = []
    rows += [("g1", "hot")] * 60 + [("g1", f"t{rng.randrange(500)}") for _ in range(540)]
    rows += [("g2", "warm")] * 30 + [("g2", "hot")] * 4 + [
        ("g2", f"u{rng.randrange(500)}") for _ in range(166)
    ]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "g string, v string").repartition(8)
    got = {
        (r["g"], r["value"]): r["cnt"]
        for r in heavy_hitters(df, "v", 0.08, group_col="g").collect()
    }
    expect = {}
    for g in ("g1", "g2"):
        vals = [v for gg, v in rows if gg == g]
        for v, c in _exact(vals, 0.08).items():
            expect[(g, v)] = c
    assert got == expect
    # 'hot' is a g1 hitter but NOT a g2 hitter (4/200 = 2% < 8%)
    assert ("g1", "hot") in got and ("g2", "hot") not in got


def test_grouped_null_group_and_value_ignored(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", None), (None, "x"), ("b", "y")],
        "g string, v string",
    )
    got = {
        (r["g"], r["value"]): r["cnt"]
        for r in heavy_hitters(df, "v", 0.5, group_col="g").collect()
    }
    assert got == {("a", "x"): 2, ("b", "y"): 1}


def test_grouped_recount_is_broadcast(spark):
    df = spark.createDataFrame(
        [(f"g{i%3}", f"v{i%7}") for i in range(100)], "g string, v string"
    )
    plan = (
        heavy_hitters(df, "v", 0.1, group_col="g")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
