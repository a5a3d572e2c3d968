"""Trained quality classifier: separates planted good/bad corpora and
ranks held-out docs correctly."""

import random

from kausaldb_spark.functions import classify as cls


def _corpus(rng, n, good):
    rows = []
    for i in range(n):
        if good:
            words = rng.choices(
                ["the", "cat", "sat", "on", "mat", "and", "dog", "ran",
                 "to", "house", "in", "garden", "of", "quiet", "town"],
                k=rng.randint(20, 40),
            )
        else:
            words = rng.choices(
                ["xqz", "zzz", "@@@@", "####", "aaaaaaaa", "!!!!", "qqq"],
                k=rng.randint(3, 8),
            )
        rows.append(" ".join(words))
    return rows


def test_classifier_separates_planted_quality(spark):
    rng = random.Random(3)
    good = _corpus(rng, 40, True)
    bad = _corpus(rng, 40, False)
    train = spark.createDataFrame(
        [(i, t, 1) for i, t in enumerate(good[:30])]
        + [(100 + i, t, 0) for i, t in enumerate(bad[:30])],
        "doc_id int, text string, label int",
    )
    model = cls.train_quality_classifier(train, label_col="label")
    held = spark.createDataFrame(
        [(i, t) for i, t in enumerate(good[30:])]
        + [(100 + i, t) for i, t in enumerate(bad[30:])],
        "doc_id int, text string",
    )
    scores = {r["doc_id"]: r["p_good"] for r in
              cls.score_quality(model, held).collect()}
    g = [scores[i] for i in range(10)]
    b = [scores[100 + i] for i in range(10)]
    assert min(g) > max(b), f"overlap: good={g} bad={b}"


def test_classifier_weak_label_bootstrap(spark):
    """With no labels the heuristic quality_flag supervises; the trained
    model must agree with the heuristic on clearly-good/clearly-bad docs."""
    rng = random.Random(5)
    texts = _corpus(rng, 30, True) + _corpus(rng, 30, False)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    model = cls.train_quality_classifier(docs)
    scored = {r["doc_id"]: r["p_good"] for r in
              cls.score_quality(model, docs).collect()}
    good_mean = sum(scored[i] for i in range(30)) / 30
    bad_mean = sum(scored[30 + i] for i in range(30)) / 30
    assert good_mean > bad_mean + 0.2
