"""Adaptive cell covers and cell-prefix repartitioning (skew layer)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from europe_gis_spark.geo import cells, geom
from europe_gis_spark.operators import skew


def test_adaptive_cover_respects_budget_and_covers():
    size = cells.cell_size(14)
    ring = np.array(
        [
            [10 * size, 10 * size],
            [18 * size, 10 * size],
            [18 * size, 16 * size],
            [10 * size, 16 * size],
            [10 * size, 10 * size],
        ]
    )
    cov = cells.adaptive_cover([[ring]], res_coarse=12, res_fine=16, budget=512)
    assert len(cov) <= 512
    res_used = int(cells.cell_res(cov)[0])
    assert 12 <= res_used <= 16
    # every polygon point maps into a covered cell at the used res
    px = 10 * size + np.random.default_rng(0).uniform(0, 8 * size, 200)
    py = 10 * size + np.random.default_rng(1).uniform(0, 6 * size, 200)
    got = cells.cell_id(px, py, res_used)
    assert set(got.tolist()) <= set(cov.tolist())


def test_cell_prefix_repartition_groups_children(spark):
    xs = np.array([1000.0, 1100.0, 900_000.0, 900_100.0])
    ys = np.array([1000.0, 1100.0, 500_000.0, 500_100.0])
    cid = cells.cell_id(xs, ys, 14)
    df = spark.createDataFrame(
        pd.DataFrame({"cell": cid.astype(np.int64), "v": range(4)})
    )
    out = skew.repartition_by_cell_prefix(df, prefix_res=8, n_parts=4).toPandas()
    # prefix equals the arithmetic parent at res 8
    want = cells.parent(cid, 8)
    got = dict(zip(out.v, out.cell_prefix))
    for i in range(4):
        assert got[i] == int(want[i])
    # nearby points share a prefix, far points don't
    assert got[0] == got[1] and got[2] == got[3] and got[0] != got[2]
