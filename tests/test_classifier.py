"""Invariants for the distributed logistic-regression quality gate
(q200): training decreases the loss, fits a learnable rule, and is
bit-deterministic under repartitioning (the decimal-gradient-sum
contract). Value-level parity has no SQL twin (iterative algorithm);
these tests are the gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mtg_bulk_database_spark.operators import classifier


@pytest.fixture(scope="module")
def toy(spark):
    # linearly separable in one feature, noisy in the other
    rows = [
        (i, float(i % 7), 1.0 if i % 2 else -1.0, 1 if i % 7 >= 4 else 0)
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "id int, f1 double, f2 double, label int"
    ).cache()


def test_training_decreases_log_loss(toy):
    fcols = ["f1", "f2"]
    w0 = [0.0, 0.0, 0.0]
    w = classifier.train_logreg(toy, fcols, "label", lr=0.5, iters=15)
    l0 = classifier.log_loss(toy, fcols, "label", w0)
    l1 = classifier.log_loss(toy, fcols, "label", w)
    assert l1 < l0 * 0.8, (l0, l1)


def test_fit_separable_rule_high_accuracy(toy):
    fcols = ["f1", "f2"]
    w = classifier.train_logreg(toy, fcols, "label", lr=0.5, iters=60)
    scored = classifier.score_logreg(toy, fcols, w)
    acc = (
        scored.select(
            ((F.col("quality_p") >= 0.5).cast("int") == F.col("label"))
            .cast("int")
            .alias("ok")
        )
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert acc >= 0.95, acc


def test_weights_partitioning_independent(toy):
    fcols = ["f1", "f2"]
    w_a = classifier.train_logreg(
        toy.repartition(1), fcols, "label", lr=0.5, iters=10
    )
    w_b = classifier.train_logreg(
        toy.repartition(13, "f2"), fcols, "label", lr=0.5, iters=10
    )
    assert w_a == w_b  # bit-equal: decimal gradient sums


def test_null_rows_excluded_and_empty_raises(spark):
    df = spark.createDataFrame(
        [(1.0, None), (None, 1), (2.0, 0)], "f1 double, label int"
    )
    w = classifier.train_logreg(df, ["f1"], "label", iters=2)
    assert len(w) == 2
    empty = df.where(F.lit(False))
    with pytest.raises(ValueError):
        classifier.train_logreg(empty, ["f1"], "label", iters=1)


def test_score_null_feature_gives_null(spark):
    df = spark.createDataFrame([(None,), (1.0,)], "f1 double")
    out = classifier.score_logreg(df, ["f1"], [0.1, 0.2]).collect()
    byf = {r["f1"]: r["quality_p"] for r in out}
    assert byf[None] is None and byf[1.0] is not None
