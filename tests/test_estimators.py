"""Estimator accuracy: MinHash Jaccard estimates vs exact; HLL approx
distinct vs exact counts."""

import pytest
from pyspark.sql import functions as F

from europe_gis_spark.operators import dedup

SF = "/root/testdata/sf0.01"


def test_minhash_estimates_jaccard(spark):
    """Estimated Jaccard (matching minhash fraction) must track exact
    shingle Jaccard: near-identical planted pairs estimate high, and
    the estimator never reports high similarity for disjoint docs."""
    from europe_gis_spark.queries import _docs_with_dups

    docs = _docs_with_dups(spark, SF)
    sig = dedup.minhash_signatures(docs, n_hashes=dedup.N_HASHES)
    a = sig.alias("a")
    b = sig.alias("b")
    # planted exact dups: doc_id + 100000
    pairs = a.join(
        b, F.col("b.doc_id") == F.col("a.doc_id") + 100000
    ).filter(F.col("a.doc_id") < 100000)  # originals only, not planted ids
    match_expr = sum(
        F.when(F.col(f"a.mh{j}") == F.col(f"b.mh{j}"), 1).otherwise(0)
        for j in range(dedup.N_HASHES)
    )
    est = pairs.select(
        F.col("a.doc_id").alias("doc_id"),
        (match_expr / dedup.N_HASHES).alias("est_j"),
    ).collect()
    assert len(est) > 0
    for r in est:
        assert r.est_j == 1.0  # identical shingle sets → all minhashes equal

    # disjoint docs (different shingle universes) → estimate 0
    import pandas as pd

    two = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["aa bb cc dd ee ff gg hh ii jj", "kk ll mm nn oo pp qq rr ss tt"],
            }
        )
    )
    s2 = dedup.minhash_signatures(two)
    rows = {r.doc_id: [r[f"mh{j}"] for j in range(dedup.N_HASHES)] for r in s2.collect()}
    matches = sum(1 for x, y in zip(rows[1], rows[2]) if x == y)
    assert matches == 0


def test_approx_count_distinct_accuracy(spark):
    """The driver query now carries the bound CHECK (within_bounds must
    be uniformly true and exact counts match user_cardinality); the raw
    HLL estimate is additionally asserted at 5 % here."""
    from pyspark.sql import functions as F

    from europe_gis_spark.queries import q_approx_cardinality, q_user_cardinality

    got = {
        r.event_type: (r.n_users, r.within_bounds)
        for r in q_approx_cardinality(spark, SF).collect()
    }
    exact = {r.event_type: r.n_users for r in q_user_cardinality(spark, SF).collect()}
    for et, n in exact.items():
        assert got[et] == (n, True)
    raw = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("a"))
        .collect()
    )
    for r in raw:
        assert r.a == pytest.approx(exact[r.event_type], rel=0.05)
