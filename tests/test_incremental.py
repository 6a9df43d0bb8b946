"""Incremental learners: additivity, convergence on a separable
fixture, registry round-trips."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.ml import (
    IncrementalBernoulliNB,
    IncrementalLinearClassifier,
    MiniBatchKMeans,
    ModelRegistry,
    hashed_features,
)

POS = ["good", "great", "love", "happy", "awesome"]
NEG = ["bad", "terrible", "hate", "sad", "awful"]
NEUTRAL = ["the", "movie", "today", "weather", "i", "it"]


def _fixture_rows(n=200, seed=7):
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        lab = i % 2
        words = [(POS if lab else NEG)[rnd.randrange(5)] for _ in range(3)]
        words += [NEUTRAL[rnd.randrange(6)] for _ in range(3)]
        rnd.shuffle(words)
        rows.append((i, float(lab), words))
    return rows


@pytest.fixture(scope="module")
def feats(spark):
    df = spark.createDataFrame(_fixture_rows(), "row_id long, target double, terms array<string>")
    f = hashed_features(df, "terms", "row_id", extra_cols=("target",)).cache()
    f.count()
    yield f
    f.unpersist()


def _accuracy(model, feats):
    pred = model.predict(feats).join(feats.select("row_id", "target").distinct(), "row_id")
    return pred.agg(F.avg((F.col("prediction") == F.col("target")).cast("double"))).head()[0]


def test_nb_learns_and_is_additive(feats):
    one_pass = IncrementalBernoulliNB()
    one_pass.update(feats)
    assert _accuracy(one_pass, feats) > 0.95

    two_pass = IncrementalBernoulliNB()
    two_pass.update(feats.filter(F.col("row_id") < 100))
    two_pass.update(feats.filter(F.col("row_id") >= 100))
    # sufficient statistics are additive → batch split is irrelevant
    assert np.array_equal(one_pass.feat_count, two_pass.feat_count)
    assert np.array_equal(one_pass.class_count, two_pass.class_count)


def test_pa_converges(feats):
    m = IncrementalLinearClassifier(variant="pa")
    for _ in range(5):
        m.update(feats)
    assert _accuracy(m, feats) > 0.95


def test_sgd_converges(feats):
    m = IncrementalLinearClassifier(variant="sgd", lr=0.5)
    for _ in range(5):
        m.update(feats)
    assert _accuracy(m, feats) > 0.95


def test_kmeans_separates(feats):
    km = MiniBatchKMeans(k=2)
    km.update(feats)
    km.update(feats)
    agree = _accuracy(km, feats)
    assert max(agree, 1 - agree) > 0.9  # permutation-invariant


def test_empty_update_is_noop(spark, feats):
    m = IncrementalLinearClassifier()
    empty = feats.filter(F.lit(False))
    m.update(empty)
    assert not m.w.any()


def test_registry_roundtrip(tmp_path, feats):
    reg = ModelRegistry(str(tmp_path))
    m = IncrementalBernoulliNB()
    m.update(feats)
    reg.save("nb_test", m.get_state(), meta={"f1": 0.9})

    m2 = IncrementalBernoulliNB()
    m2.set_state(reg.load("nb_test"))
    assert np.array_equal(m.feat_count, m2.feat_count)

    assert reg.save_if_best("nb_test", m.get_state(), 0.5)
    assert not reg.save_if_best("nb_test", m.get_state(), 0.4)  # worse → rejected
    assert reg.save_if_best("nb_test", m.get_state(), 0.8)
    assert reg.meta("nb_test", best=True)["metric"] == 0.8


def test_zero_token_rows_are_predicted_not_dropped(spark):
    """A row whose text cleans to nothing must still appear in
    predictions (sklearn scores the all-zero vector from the
    bias/prior) instead of silently vanishing from the metrics."""
    from ml_with_spark_streaming_spark.ml.incremental import (
        IncrementalBernoulliNB,
        IncrementalLinearClassifier,
        hashed_features,
    )

    rows = [
        (0, 1.0, ["good", "great"]),
        (1, 0.0, ["bad", "awful"]),
        (2, 1.0, []),            # empty after cleaning
        (3, 0.0, ["", ""]),      # only empty-string tokens
    ]
    df = spark.createDataFrame(rows, "row_id long, target double, toks array<string>")
    feats = hashed_features(df, "toks", "row_id", extra_cols=("target",))
    got_ids = {r["row_id"] for r in feats.select("row_id").distinct().collect()}
    assert got_ids == {0, 1, 2, 3}  # sentinel rows keep empty docs alive

    for model in (IncrementalBernoulliNB(), IncrementalLinearClassifier(variant="pa")):
        model.update(feats)
        pred = {r["row_id"]: r["prediction"] for r in model.predict(feats).collect()}
        assert set(pred) == {0, 1, 2, 3}  # all rows scored, incl. zero-vector
        assert pred[0] == 1.0 and pred[1] == 0.0  # real rows still learn
