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


def test_weighted_sample_topk_matches_numpy_and_has_margin(spark):
    """A-ES top-k vs an independent numpy recompute at sf0.01, plus the
    float-margin guarantee the cross-engine oracle relies on: the gap
    between the k-th and (k+1)-th selection key must dwarf any libm
    pow() disagreement (~1 ulp, rel ~1e-16)."""
    import hashlib

    import numpy as np
    import pandas as pd

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    k = 40
    got = (
        windows.weighted_sample_topk(docs, k, "n_chars")
        .select("doc_id")
        .toPandas()["doc_id"]
        .tolist()
    )

    pdf = docs.select("doc_id", "n_chars").toPandas()
    pdf = pdf[pdf.n_chars > 0]
    u = np.array(
        [
            (int(hashlib.md5(f"wsample:v1|{d}".encode()).hexdigest()[:13], 16) + 1)
            / 16**13
            for d in pdf.doc_id
        ]
    )
    key = u ** (1.0 / pdf.n_chars.to_numpy().astype(float))
    order = np.lexsort((pdf.doc_id.to_numpy(), -key))
    want = pdf.doc_id.to_numpy()[order[:k]].tolist()
    assert sorted(got) == sorted(want)

    ks = np.sort(key)[::-1]
    margin = (ks[k - 1] - ks[k]) / ks[k - 1]
    assert margin > 1e-9, f"selection margin {margin} too thin for libm parity"


def test_weighted_sample_topk_is_weight_biased(spark):
    """Heavy rows must be drawn far above their uniform share: give 10
    of 2000 rows 1000x the weight of the rest and require most of a
    k=20 sample to be heavy (uniform would include ~0.1 heavy rows)."""
    rows = [(i, 100_000 if i < 10 else 100) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = windows.weighted_sample_topk(df, 20, "w").toPandas()
    n_heavy = int((got.doc_id < 10).sum())
    assert n_heavy >= 8, f"only {n_heavy}/10 heavy rows sampled"
    # weight<=0 / NULL rows are excluded, never crash
    df2 = spark.createDataFrame(
        [(1, 0), (2, -5), (3, None), (4, 7)], "doc_id long, w int"
    )
    assert windows.weighted_sample_topk(df2, 10, "w").count() == 1
