"""In-engine Naive Bayes classifier (operators/classifier.py)."""

from __future__ import annotations

import pytest

from biocache_store_spark.operators.classifier import nb_classify, train_nb


@pytest.fixture(scope="module")
def trained(spark):
    train = spark.createDataFrame(
        [
            (1, "apple banana cherry apple", "fruit"),
            (2, "banana cherry date banana", "fruit"),
            (3, "carrot potato onion carrot", "veg"),
            (4, "potato onion leek potato", "veg"),
            (5, "stray tokens here", None),  # NULL label: excluded
        ],
        "doc_id int, text string, label string",
    )
    model, labels = train_nb(train, label_col="label")
    return train, model, labels


def test_nb_separable_vocab_and_exclusions(spark, trained):
    """Clearly separable vocabularies classify correctly; NULL-label rows
    train nothing; empty-text docs are omitted from classification."""
    _, model, labels = trained
    assert {r["label"] for r in labels.collect()} == {"fruit", "veg"}
    test = spark.createDataFrame(
        [
            (10, "apple cherry banana"),
            (11, "onion potato carrot"),
            (12, ""),  # no features -> omitted
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in nb_classify(test, model, labels).collect()}
    assert set(out) == {10, 11}
    assert out[10]["label"] == "fruit"
    assert out[11]["label"] == "veg"
    assert out[10]["score"] > 0 and out[11]["score"] > 0


def test_nb_scores_partitioning_independent(spark, trained):
    """The rational-arithmetic discipline: identical scores under any
    partitioning of both the training and the test relation."""
    train, model, labels = trained
    test = spark.createDataFrame(
        [(10, "apple cherry banana leek"), (11, "onion date")],
        "doc_id int, text string",
    )
    base = {
        (r["doc_id"], r["label"]): r["score"]
        for r in nb_classify(test, model, labels).collect()
    }
    model7, labels7 = train_nb(train.repartition(7), label_col="label")
    again = {
        (r["doc_id"], r["label"]): r["score"]
        for r in nb_classify(
            test.repartition(5), model7, labels7
        ).collect()
    }
    assert base == again


def test_nb_unseen_vocab_prior_tiebreak(spark):
    """A document of entirely unseen vocabulary gets the smoothing-only
    likelihood for every label, so the prior (and the deterministic
    label-ascending tie-break) decides — never a crash or a drop."""
    train = spark.createDataFrame(
        [
            (1, "aa bb", "x"),
            (2, "aa bb", "x"),
            (3, "cc dd", "y"),
        ],
        "doc_id int, text string, label string",
    )
    model, labels = train_nb(train, label_col="label")
    test = spark.createDataFrame(
        [(10, "zz qq ww")], "doc_id int, text string"
    )
    rows = nb_classify(test, model, labels).collect()
    assert len(rows) == 1
    # x has prior 2/3 and the same per-label feature mass as y (both
    # trained on 3 features: 2 unigrams + 1 bigram), so x wins on prior
    assert rows[0]["label"] == "x"
