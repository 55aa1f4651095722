"""Naive Bayes seed classifier: accuracy floor on a separable synthetic
corpus, exact hand-computed posterior on a 4-doc fixture, and the argmax
window stays doc-partitioned (no single-partition window)."""

from __future__ import annotations

import math

from wolf_quake_spark.analysis.classify import nb_confusion, nb_predictions


def test_nb_separable_corpus_accuracy(spark):
    rows = []
    for i in range(60):
        lang = ["aa", "bb", "cc"][i % 3]
        word = {"aa": "alpha", "bb": "beta", "cc": "gamma"}[lang]
        rows.append((i, f"{word} {word} shared {word}", lang))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = nb_predictions(docs).collect()
    assert len(out) == 12  # doc_id % 5 == 0
    assert all(r["correct"] for r in out)
    conf = {
        (r["true_lang"], r["pred_lang"]): r["n"]
        for r in nb_confusion(docs).collect()
    }
    assert sum(conf.values()) == 12
    assert all(t == p for (t, p) in conf)


def test_nb_posterior_hand_computed(spark):
    # train: docs 1-4 (folds != 0); test: doc 0
    docs = spark.createDataFrame(
        [
            (0, "x y", "?"),
            (1, "x x", "en"),
            (2, "x y", "en"),
            (3, "y y", "de"),
            (4, "y x", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    out = nb_predictions(docs).collect()
    assert len(out) == 1
    r = out[0]
    # counts: en: x=3 y=1 total=4; de: x=1 y=3 total=4; V=2, priors 2/4 each
    s_en = math.log(2 / 4) + math.log((3 + 1) / (4 + 2)) + math.log((1 + 1) / (4 + 2))
    s_de = math.log(2 / 4) + math.log((1 + 1) / (4 + 2)) + math.log((3 + 1) / (4 + 2))
    assert abs(s_en - s_de) < 1e-12  # symmetric → tie → class ASC wins
    assert r["pred_lang"] == "de"
    assert r["score"] == round(s_de, 6)


def test_nb_plan_doc_partitioned_window(spark):
    docs = spark.createDataFrame(
        [(0, "x", "en"), (1, "x", "en")], "doc_id long, text string, lang string"
    )
    plan = nb_predictions(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the argmax window must be keyed by doc_id, not global
    assert "Window" in plan
    assert "hashpartitioning(doc_id" in plan
