"""Trained quality classifier: separation on planted good/bad docs,
bit-determinism of the training loop, and the truncate-toward-zero
division semantics the cross-engine replay rides on. The contract query
gates the full gradient replay vs DuckDB bit-exactly."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.operators import classifier as C


def _planted_docs(spark):
    rng = random.Random(11)
    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
             "dogs", "and", "a", "of", "to", "in", "is", "it", "report",
             "quarter", "growth", "model", "data"]
    rows = []
    # good: long clean prose with stopwords (label 1 under the gate)
    for i in range(40):
        rows.append(
            (i, " ".join(rng.choice(words) for _ in range(120)))
        )
    # bad: short punct-heavy garbage (label 0 under the gate)
    for i in range(40, 80):
        rows.append(
            (i, "".join(rng.choice("!@#$%^&*(){}[]<>~") for _ in range(30)))
        )
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tdiv_truncates_toward_zero():
    assert C._tdiv(7, 2) == 3
    assert C._tdiv(-7, 2) == -3
    assert C._tdiv(7, -2) == -3
    assert C._tdiv(-7, -2) == 3
    assert C._tdiv(0, 5) == 0


def test_classifier_separates_planted_docs(spark):
    docs = _planted_docs(spark)
    out = C.quality_classifier(docs).collect()
    assert len(out) == 80
    by_id = {r["doc_id"]: r for r in out}
    # the distilled labels match the plant
    assert all(by_id[i]["label"] == 1 for i in range(40))
    assert all(by_id[i]["label"] == 0 for i in range(40, 80))
    # the TRAINED model separates them perfectly on this margin
    assert all(by_id[i]["predicted"] == 1 for i in range(40))
    assert all(by_id[i]["predicted"] == 0 for i in range(40, 80))
    # probabilities sit on the right side with a real gap
    good_min = min(by_id[i]["prob"] for i in range(40))
    bad_max = max(by_id[i]["prob"] for i in range(40, 80))
    assert good_min >= 0.5 > bad_max


def test_training_is_bit_deterministic(spark):
    docs = _planted_docs(spark)
    w1 = C.train_quality_classifier(docs)
    w2 = C.train_quality_classifier(docs)
    assert w1 == w2
    assert any(w != 0 for w in w1)
    assert all(isinstance(w, int) for w in w1)


def test_scoring_pass_is_map_only(spark):
    # after training, scoring the corpus must be one map-only projection
    # — no shuffle, no join against anything corpus-sized
    docs = _planted_docs(spark)
    w = C.train_quality_classifier(docs)
    feats = C.quality_features(docs)
    plan = (
        C._scores(feats, w, C.FEATURE_SCALE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_empty_and_whitespace_docs_score_without_nan(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "regular words here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in C.quality_classifier(docs).collect()}
    assert set(out) == {1, 2, 3}
    for r in out.values():
        assert r["prob"] is not None and 0.0 <= r["prob"] <= 1.0
