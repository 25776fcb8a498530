"""Tests for the hashed NB/linear text classifier (operators/classifier.py)."""

import math

import pytest
from pyspark.sql import functions as F

POS = [
    "the encyclopedia article discusses the history of science",
    "a detailed article on the theory of computation",
    "the study of mathematics and the history of logic",
]
NEG = [
    "click here buy now cheap deals free free free",
    "winner winner claim your free prize now click",
    "cheap pills buy now limited offer click here",
]


def _train_df(spark):
    rows = [(i, t, 1) for i, t in enumerate(POS)] + [
        (100 + i, t, 0) for i, t in enumerate(NEG)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_train_and_score_separates_classes(spark):
    from jodie_spark.operators.classifier import classifier_score, train_nb_classifier

    df = _train_df(spark)
    weights, bias = train_nb_classifier(df, n_buckets=1 << 16)
    assert bias == pytest.approx(math.log(1.0), abs=1e-12)  # balanced classes

    scores = dict(classifier_score(df, weights, bias=bias, n_buckets=1 << 16).collect())
    pos_scores = [scores[i] for i in range(len(POS))]
    neg_scores = [scores[100 + i] for i in range(len(NEG))]
    assert min(pos_scores) > 0.9
    assert max(neg_scores) < 0.1


def test_score_unseen_and_empty_docs(spark):
    from jodie_spark.operators.classifier import classifier_score, train_nb_classifier

    weights, bias = train_nb_classifier(_train_df(spark), n_buckets=1 << 16)
    unseen = spark.createDataFrame(
        [(1, "zzzqqq xxyyzz"), (2, ""), (3, "   ")], ["doc_id", "text"]
    )
    scores = dict(classifier_score(unseen, weights, bias=bias, n_buckets=1 << 16).collect())
    # unseen tokens carry weight 0 -> sigmoid(bias); empty docs too
    for v in scores.values():
        assert v == pytest.approx(1.0 / (1.0 + math.exp(-bias)), abs=1e-9)


def test_classifier_filter_and_with_score(spark):
    from jodie_spark.operators.classifier import (
        classifier_filter,
        train_nb_classifier,
        with_classifier_score,
    )

    df = _train_df(spark)
    weights, bias = train_nb_classifier(df, n_buckets=1 << 16)
    kept = classifier_filter(df, weights, threshold=0.5, bias=bias, n_buckets=1 << 16)
    assert {r["doc_id"] for r in kept.select("doc_id").collect()} == {0, 1, 2}
    assert kept.columns == df.columns

    scored = with_classifier_score(df, weights, bias=bias, n_buckets=1 << 16)
    assert "score" in scored.columns and scored.count() == 6


def test_train_requires_both_labels(spark):
    from jodie_spark.operators.classifier import train_nb_classifier

    df = spark.createDataFrame([(1, "a b", 1)], ["doc_id", "text", "label"])
    with pytest.raises(ValueError):
        train_nb_classifier(df)


def test_scoring_broadcasts_model(spark):
    from jodie_spark.operators.classifier import classifier_score, train_nb_classifier

    df = _train_df(spark)
    weights, bias = train_nb_classifier(df, n_buckets=1 << 16)
    plan = (
        classifier_score(df, weights, bias=bias, n_buckets=1 << 16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
