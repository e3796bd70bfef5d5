"""Sampling / split / permutation operators (SURVEY.md §2.6 O1–O6)."""

import pytest
from pyspark.sql import functions as F

from europe_gis_spark.operators import windows


@pytest.fixture(scope="module")
def labeled(spark):
    return spark.range(0, 5000).select(
        F.col("id"),
        (F.col("id") % 4).cast("int").alias("label_bucket"),
        F.rand(7).alias("feature"),
    )


def test_stratified_sample_by_fractions(spark, labeled):
    fr = {0: 0.5, 1: 0.1, 2: 1.0, 3: 0.0}
    got = windows.stratified_sample(labeled, fr, seed=42).groupBy("label_bucket").count()
    counts = {r.label_bucket: r["count"] for r in got.collect()}
    assert counts.get(2) == 1250  # fraction 1.0 keeps all
    assert 3 not in counts  # fraction 0 drops all
    assert 400 <= counts.get(0, 0) <= 850
    assert 50 <= counts.get(1, 0) <= 250
    # reproducible with the same seed
    again = {
        r.label_bucket: r["count"]
        for r in windows.stratified_sample(labeled, fr, seed=42)
        .groupBy("label_bucket")
        .count()
        .collect()
    }
    assert again == counts


def test_train_test_split_deterministic(spark, labeled):
    tr1, te1 = windows.train_test_split(labeled, 0.2, seed=9)
    tr2, te2 = windows.train_test_split(labeled, 0.2, seed=9)
    assert tr1.count() + te1.count() == 5000
    assert sorted(r.id for r in te1.collect()) == sorted(r.id for r in te2.collect())
    frac = te1.count() / 5000
    assert 0.1 < frac < 0.3


def test_random_permutation_seeded(spark, labeled):
    """O1/O2: orderBy(rand(seed)) is a deterministic permutation."""
    p1 = [r.id for r in labeled.orderBy(F.rand(13), F.col("id")).limit(50).collect()]
    p2 = [r.id for r in labeled.orderBy(F.rand(13), F.col("id")).limit(50).collect()]
    assert p1 == p2
    assert p1 != sorted(p1)


def test_per_class_counts(spark, labeled):
    """G9: group-size accounting used for dataset sizing."""
    got = {r.label_bucket: r["count"] for r in labeled.groupBy("label_bucket").count().collect()}
    assert got == {0: 1250, 1: 1250, 2: 1250, 3: 1250}


def test_stratified_hash_sample_deterministic_and_rated(spark):
    """Kept set identical across runs/partitionings; per-stratum rates
    hold within binomial noise; unknown strata drop."""
    import pandas as pd

    from europe_gis_spark.operators import windows

    n = 4000
    df = pd.DataFrame(
        {"doc_id": range(n), "lang": [("en", "de", "xx")[i % 3] for i in range(n)]}
    )
    rates = {"en": 0.5, "de": 0.1}
    a = windows.stratified_hash_sample(
        spark.createDataFrame(df), rates, "lang"
    ).toPandas()
    b = windows.stratified_hash_sample(
        spark.createDataFrame(df).repartition(13), rates, "lang"
    ).toPandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)
    assert set(a.lang) <= {"en", "de"}  # 'xx' dropped
    by = a.groupby("lang").size()
    assert abs(by["en"] / (n / 3) - 0.5) < 0.06
    assert abs(by["de"] / (n / 3) - 0.1) < 0.04
