"""Z-order layout: Morton key correctness + row-group pruning wins."""

import numpy as np
from pyspark.sql import functions as F

from europe_gis_spark.operators import layout


def _morton_py(xb, yb):
    out = 0
    for i in range(32):
        out |= ((xb >> i) & 1) << (2 * i)
        out |= ((yb >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_python_interleave(spark):
    pts = [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (7.0, 5.0), (1023.0, 1.0), (513.2, 777.9)]
    df = spark.createDataFrame(pts, "x double, y double")
    got = df.select(
        "x", "y", layout.zorder_key(F.col("x"), F.col("y"), 0.0, 0.0, 1.0).alias("z")
    ).collect()
    for r in got:
        assert r.z == _morton_py(int(r.x), int(r.y)), (r.x, r.y)


def test_zorder_layout_prunes_bbox_scans(spark, tmp_path):
    """Same rows, two layouts: arrival order leaves every row group
    spanning the full extent (zero pruning); Z-order confines a small
    bbox to a fraction of the groups — measured off the identical
    parquet min/max statistics Spark's reader uses."""
    n = 200_000
    df = spark.range(n).select(
        ((F.col("id") * 7919) % 1000).cast("double").alias("x"),
        ((F.col("id") * 104729) % 1000).cast("double").alias("y"),
        F.col("id").alias("payload"),
    )
    zp, pp = str(tmp_path / "z"), str(tmp_path / "p")
    layout.write_zordered(df, zp, "x", "y", 0.0, 0.0, cell=1.0, n_files=8)
    df.repartition(8).write.parquet(pp)

    bbox = (100.0, 100.0, 150.0, 150.0)  # 0.25 % of the extent
    zhit, ztot = layout.intersecting_row_groups(zp, "x", "y", bbox)
    phit, ptot = layout.intersecting_row_groups(pp, "x", "y", bbox)
    assert phit == ptot  # arrival order: no group can be skipped
    assert zhit <= ztot // 4, (zhit, ztot)

    # layout changed nothing about the DATA: bbox counts identical
    cond = (
        (F.col("x") >= bbox[0]) & (F.col("x") <= bbox[2])
        & (F.col("y") >= bbox[1]) & (F.col("y") <= bbox[3])
    )
    assert (
        spark.read.parquet(zp).filter(cond).count()
        == spark.read.parquet(pp).filter(cond).count()
    )


def test_zorder_key_fuzz_vs_python(spark):
    """Random bucketed coords: the column-arithmetic Morton key equals
    the bit-twiddling python reference."""
    rng = np.random.default_rng(11)
    xs = rng.integers(0, 1 << 20, 50)
    ys = rng.integers(0, 1 << 20, 50)
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(xs, ys)], "x double, y double"
    )
    got = df.select(
        "x", "y", layout.zorder_key(F.col("x"), F.col("y"), 0.0, 0.0, 1.0).alias("z")
    ).collect()
    for r in got:
        assert r.z == _morton_py(int(r.x), int(r.y))


def test_compact_parquet_reduces_files_and_preserves_data(spark, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    df = spark.range(50_000).select(
        F.col("id"), (F.col("id") % 100).cast("double").alias("x")
    )
    df.repartition(64).write.parquet(src)  # 64 tiny files
    import glob

    assert len(glob.glob(src + "/*.parquet")) == 64
    n = layout.compact_parquet(spark, src, dst, target_file_mb=512)
    assert n == 1
    outs = glob.glob(dst + "/*.parquet")
    assert len(outs) == 1
    got = spark.read.parquet(dst)
    assert got.count() == 50_000
    assert got.agg(F.sum("id")).collect()[0][0] == 50_000 * 49_999 // 2
    # sorted compaction keeps stats tight for the sort column
    big_src, dst2 = str(tmp_path / "bigfrag"), str(tmp_path / "sorted")
    spark.range(1_500_000).select(
        F.col("id"),
        (F.col("id") % 100).cast("double").alias("x"),
        F.concat(F.lit("pad-pad-pad-"), F.col("id")).alias("pad"),
    ).repartition(64).write.parquet(big_src)
    n2 = layout.compact_parquet(
        spark, big_src, dst2, target_file_mb=1, sort_cols=("x",)
    )
    assert n2 > 1
    hit, total = layout.intersecting_row_groups(
        dst2, "x", "x", (0.0, 0.0, 5.0, 5.0)
    )
    assert total > 1 and hit < total
