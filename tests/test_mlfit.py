"""Unit tests for ext/mlfit.py (oracle-reproducible logistic GD)."""

from __future__ import annotations

import random

from rabbit_in_a_blender_spark.ext.mlfit import logreg_fit, logreg_metrics


def _separable(spark, n=400, parts=4, seed=2):
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        y = rng.random() < 0.5
        # class means at x=(1,1) vs x=(-1,-1): cleanly separable
        mu = 1.0 if y else -1.0
        rows.append(
            (mu + rng.gauss(0, 0.4), mu + rng.gauss(0, 0.4), 1.0 if y else 0.0)
        )
    return spark.createDataFrame(rows, "x1 double, x2 double, y double").repartition(
        parts
    )


def test_logreg_learns_separable_data(spark):
    df = _separable(spark)
    w = logreg_fit(df, ["x1", "x2"], "y", steps=10, lr=1.0)
    m = logreg_metrics(df, ["x1", "x2"], "y", w).collect()[0]
    assert m["accuracy"] >= 0.95
    assert w[1] > 0 and w[2] > 0  # both features point at the positive class
    # it actually predicts BOTH classes
    assert m["tp"] > 0 and m["tn"] > 0


def test_logreg_weights_partitioning_invariant(spark):
    """The decimal-grid rounding makes the fit bit-identical no matter
    how the rows are partitioned — the property the oracle relies on."""
    base = _separable(spark, parts=1)
    w1 = logreg_fit(base.repartition(1), ["x1", "x2"], "y", steps=6, lr=1.0)
    w2 = logreg_fit(base.repartition(13), ["x1", "x2"], "y", steps=6, lr=1.0)
    assert w1 == w2


def test_logreg_more_steps_do_not_hurt_separable_fit(spark):
    df = _separable(spark, seed=7)
    short = logreg_fit(df, ["x1", "x2"], "y", steps=2, lr=1.0)
    long = logreg_fit(df, ["x1", "x2"], "y", steps=12, lr=1.0)
    acc = lambda w: logreg_metrics(df, ["x1", "x2"], "y", w).collect()[0][  # noqa: E731
        "accuracy"
    ]
    assert acc(long) >= acc(short)


def test_logreg_releases_its_cache(spark):
    sc = spark.sparkContext
    before = len(sc._jsc.getPersistentRDDs())
    logreg_fit(_separable(spark, n=60), ["x1", "x2"], "y", steps=2)
    assert len(sc._jsc.getPersistentRDDs()) == before
