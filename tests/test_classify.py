"""Hashed bag-of-ngrams quality classifier: frozen-model determinism,
engine-vs-driver-twin exactness, decision quality on held-out synth."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from europe_gis_spark.operators import classify


def _driver_score(text, w, b):
    gs = classify.grams_of(text)
    s = sum(w[classify.bucket_of(g)] for g in gs)
    return b + (s / classify.FIXED_POINT) / len(gs)


def test_training_is_deterministic_and_separates():
    w1, b1 = classify.train_quality_classifier()
    classify.train_quality_classifier.cache_clear()
    w2, b2 = classify.train_quality_classifier()
    assert w1 == w2 and b1 == b2
    docs = classify._synth_labeled_docs()
    acc = sum(
        (_driver_score(t, w1, b1) > 0) == bool(y) for t, y in docs
    ) / len(docs)
    assert acc >= 0.98


def test_engine_matches_driver_twin_exactly(spark):
    w, b = classify.train_quality_classifier()
    texts = [
        "the government report on water and health systems",
        "buy cheap click here now free win prize buy cheap",
        "zzkqx zzkqx zzkqx zzkqx zzkqx",
        "single",  # 1 token: no bigrams, exercises the empty-slice guard
        "two words",
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = {
        r.doc_id: r
        for r in classify.quality_classifier_scores(df).collect()
    }
    for i, t in enumerate(texts):
        gs = classify.grams_of(t)
        s = sum(w[classify.bucket_of(g)] for g in gs)
        assert got[i].feat_sum == s, (i, got[i].feat_sum, s)
        assert got[i].n_feats == len(gs)
        assert got[i].keep == (round(_driver_score(t, w, b), 9) > 0)
    assert got[0].keep and not got[1].keep and not got[2].keep


def test_scoring_plan_is_map_side_only(spark):
    """The whole scorer must be one projection over the scan — no
    Exchange, no Join, no Python eval (weights fold into the plan)."""
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["a b c"]})
    )
    plan = (
        classify.quality_classifier_scores(df)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    for bad in ("Exchange", "Join", "PythonUDF", "mapInPandas"):
        assert bad not in plan, f"{bad} in scorer plan:\n{plan[:500]}"


def test_bucket_limit_guard():
    with pytest.raises(ValueError):
        classify.quality_classifier_scores(
            None, weights=tuple(range(classify.LITERAL_BUCKET_LIMIT + 1)),
            bias=0.0,
        )
