"""Count-Min sketch + Bloom semi-join: the sketch guarantees
(never-underestimate, mergeability, no false negatives) as executable
properties."""

import pyspark.sql.functions as F


def test_cms_never_underestimates_and_is_usually_exact(spark):
    from europe_gis_spark.operators import sketch

    # zipf-ish: item k appears 200//k times
    rows = [(f"item{k}",) for k in range(1, 40) for _ in range(200 // k)]
    items = spark.createDataFrame(rows, "term string")
    counters = sketch.cms_build(items)
    exact = items.groupBy("term").agg(F.count("*").alias("exact"))
    est = sketch.cms_estimate(counters, exact.select("term"))
    joined = {r.term: (r.est, r.exact) for r in est.join(exact, "term").collect()}
    assert len(joined) == 39
    assert all(e >= x for e, x in joined.values())
    # 39 distinct items in 4x1024 buckets: collisions are rare; the
    # heaviest item must estimate exactly
    assert joined["item1"][0] == joined["item1"][1] == 200


def test_cms_counters_are_bounded_and_merge_equals_union(spark):
    from europe_gis_spark.operators import sketch

    a = spark.createDataFrame([(f"w{i % 7}",) for i in range(100)], "term string")
    b = spark.createDataFrame([(f"w{i % 11}",) for i in range(80)], "term string")
    ca, cb = sketch.cms_build(a), sketch.cms_build(b)
    assert ca.count() <= sketch.CMS_DEPTH * sketch.CMS_WIDTH
    merged = {(r.i, r.bucket): r.c for r in sketch.cms_merge(ca, cb).collect()}
    direct = {
        (r.i, r.bucket): r.c
        for r in sketch.cms_build(a.unionByName(b)).collect()
    }
    assert merged == direct


def test_cms_absent_item_estimates_near_zero(spark):
    from europe_gis_spark.operators import sketch

    items = spark.createDataFrame([(f"x{i}",) for i in range(50)], "term string")
    counters = sketch.cms_build(items)
    q = spark.createDataFrame([("never-seen",)], "term string")
    [(row)] = sketch.cms_estimate(counters, q).collect()
    # 50 distinct single-count items: an absent key collides with at
    # most a handful across all 4 rows; min over rows is ~always 0
    assert row.est <= 2


def test_bloom_semi_join_equals_exact_semi_join_and_prunes(spark):
    from europe_gis_spark.operators import sketch

    fact = spark.createDataFrame(
        [(i % 1000, i) for i in range(5000)], "k long, v long"
    )
    dims = spark.createDataFrame([(i,) for i in range(0, 100)], "dk long")
    got = sorted(
        (r.k, r.v)
        for r in sketch.bloom_semi_join(fact, dims, "k", "dk").collect()
    )
    want = sorted(
        (r.k, r.v)
        for r in fact.join(
            dims.select(F.col("dk").alias("k")), "k", "left_semi"
        ).collect()
    )
    assert got == want and len(got) == 500
    # the bloom filter alone must prune the disjoint tail hard: keys
    # 100..999 only pass if all 5 md5 probes collide with set bits
    bits = {
        r.pos
        for r in sketch.bloom_bit_positions(dims, "dk").collect()
    }
    assert len(bits) <= 5 * 100


def test_hll_raw_branch_accuracy(spark):
    """Large cardinality (20k ≫ 2.5·m) exercises the raw harmonic-mean
    branch; rsd for m=512 is ~4.6 %, assert within 3σ ≈ 14 %."""
    from europe_gis_spark.operators import sketch

    df = spark.range(20_000).select(
        F.lit("g").alias("g"), F.col("id").alias("k")
    )
    [row] = sketch.hll_cardinality(df, "k", ["g"]).collect()
    assert abs(row.est_distinct - 20_000) / 20_000 < 0.14


def test_hll_linear_counting_branch_accuracy(spark):
    """Small cardinality (100 < 2.5·m with empty registers) takes the
    linear-counting branch, which is tighter than the raw estimate."""
    from europe_gis_spark.operators import sketch

    df = spark.range(100).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    [row] = sketch.hll_cardinality(df, "k", ["g"]).collect()
    assert abs(row.est_distinct - 100) / 100 < 0.1


def test_hll_registers_merge_equals_union(spark):
    """The mergeable-sketch contract: max-merging the register tables
    of two disjoint halves equals the whole input's registers (so
    per-shard sketches combine without touching raw data)."""
    from europe_gis_spark.operators import sketch

    whole = spark.range(5_000).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    lo = whole.filter(F.col("k") < 2_500)
    hi = whole.filter(F.col("k") >= 2_500)
    merged = (
        sketch.hll_registers(lo, "k", ["g"])
        .unionByName(sketch.hll_registers(hi, "k", ["g"]))
        .groupBy("g", "bucket")
        .agg(F.max("mx").alias("mx"))
    )
    a = {(r.bucket, r.mx) for r in merged.collect()}
    b = {(r.bucket, r.mx)
         for r in sketch.hll_registers(whole, "k", ["g"]).collect()}
    assert a == b
