"""Exact discrete quantiles (histogram + two-phase prefix sum): output
must equal the closed-form definition — smallest value whose cumulative
count reaches ceil(q*N) — on any distribution, including ties and
skew."""

import math
import random
from fractions import Fraction

import pytest

from jodie_spark.operators.profile import exact_quantiles


def _expected(values, qs):
    # true mathematical rank: ceil computed over an exact rational
    # q*N, NOT double math (which rounds 0.07*100 up to rank 8)
    vals = sorted(v for v in values if v is not None)
    n = len(vals)
    return {q: vals[math.ceil(Fraction(str(q)) * n) - 1] for q in qs}


def _check(spark, values, qs, partitions=8):
    df = spark.createDataFrame([(v,) for v in values], "v int").repartition(
        partitions
    )
    got = {r["q"]: r["value"] for r in exact_quantiles(df, "v", qs).collect()}
    assert got == _expected(values, qs)


def test_uniform(spark):
    _check(spark, list(range(1, 101)), [0.5, 0.9, 0.99, 1.0])


def test_heavy_ties(spark):
    """Most mass on one value: every mid quantile must return it."""
    vals = [7] * 900 + list(range(100))
    _check(spark, vals, [0.2, 0.5, 0.9, 0.95, 1.0])


def test_skewed_random(spark):
    rng = random.Random(3)
    vals = [int(rng.expovariate(0.01)) for _ in range(2000)]
    _check(spark, vals, [0.01, 0.25, 0.5, 0.75, 0.99, 1.0], partitions=16)


def test_single_row(spark):
    _check(spark, [42], [0.5, 1.0])


def test_rank_not_inflated_by_double_rounding(spark):
    """q*N that is an exact integer mathematically but rounds UP in
    double arithmetic (0.07*100 = 7.000000000000001) must still hit
    the true rank, not the next-higher value: at N=100 over 1..100,
    q=0.07 is the 7th value = 7, not 8 (ADVICE r10, medium)."""
    _check(spark, list(range(1, 101)), [0.07, 0.14, 0.28, 0.29, 0.57])
    # same property at N=10000 where q*N integer products also misround
    vals = list(range(1, 10001))
    _check(spark, vals, [0.55, 0.07], partitions=16)
    # and through the grouped path
    rows = [("a", v) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "g string, v int")
    got = {
        r["q"]: r["value"]
        for r in exact_quantiles(df, "v", [0.07, 0.14], group_col="g").collect()
    }
    assert got == {0.07: 7, 0.14: 14}


def test_nulls_ignored(spark):
    df = spark.createDataFrame([(1,), (None,), (3,), (None,), (2,)], "v int")
    got = {r["q"]: r["value"] for r in exact_quantiles(df, "v", [0.5, 1.0]).collect()}
    assert got == {0.5: 2, 1.0: 3}


def test_q_validation(spark):
    df = spark.createDataFrame([(1,)], "v int")
    with pytest.raises(ValueError, match="quantiles"):
        exact_quantiles(df, "v", [0.0])
    with pytest.raises(ValueError, match="quantiles"):
        exact_quantiles(df, "v", [1.5])
    # ADVICE r11: a computed fraction past decimal(12,10) precision
    # would silently shift the rank (up to ~50 ranks at N=1e12) — the
    # API boundary rejects it and tells the caller how to quantize
    with pytest.raises(ValueError, match="10 decimal digits"):
        exact_quantiles(df, "v", [1 / 3])
    with pytest.raises(ValueError, match="10 decimal digits"):
        exact_quantiles(df, "v", [1 / 3], group_col="v")
    # an explicitly quantized fraction is accepted
    got = {r["q"]: r["value"] for r in exact_quantiles(df, "v", [round(1 / 3, 10)]).collect()}
    assert got == {round(1 / 3, 10): 1}
    # quantize=True is the documented escape hatch (ADVICE r12): the
    # fraction rounds for the caller and the q column carries the
    # ROUNDED value; a quantize that would hit 0 clamps to 1e-10
    got = {r["q"]: r["value"] for r in exact_quantiles(df, "v", [1 / 3], quantize=True).collect()}
    assert got == {round(1 / 3, 10): 1}
    got = {r["q"]: r["value"] for r in exact_quantiles(df, "v", [1e-14], quantize=True).collect()}
    assert got == {1e-10: 1}


def test_empty_input(spark):
    df = spark.createDataFrame([], "v int")
    assert exact_quantiles(df, "v", [0.5]).collect() == []


def test_grouped_quantiles(spark):
    """Per-group ranks against each group's own row count — exact vs
    brute force on uneven groups with ties."""
    rows = [("a", v) for v in range(1, 101)] + [("b", 7)] * 50 + [("b", 9)] * 10
    df = spark.createDataFrame(rows, "g string, v int").repartition(8)
    got = {
        (r["g"], r["q"]): r["value"]
        for r in exact_quantiles(df, "v", [0.5, 0.9, 1.0], group_col="g").collect()
    }
    expect = {}
    for g in ("a", "b"):
        vals = [v for gg, v in rows if gg == g]
        for q, v in _expected(vals, [0.5, 0.9, 1.0]).items():
            expect[(g, q)] = v
    assert got == expect
    assert got[("b", 0.5)] == 7 and got[("b", 1.0)] == 9


def test_grouped_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), (None, 5), ("a", 3)], "g string, v int"
    )
    got = {
        (r["g"], r["q"]): r["value"]
        for r in exact_quantiles(df, "v", [0.5, 1.0], group_col="g").collect()
    }
    assert got == {("a", 0.5): 1, ("a", 1.0): 3}
