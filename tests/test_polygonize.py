"""Connected-region polygonize (F9, features.shapes semantics) vs a
whole-raster BFS oracle: region count, sizes, values and bboxes must
match exactly — including regions spanning tile boundaries."""

import numpy as np
import pandas as pd

from europe_gis_spark.operators import layers

TILE_W = 16


def _bfs_regions(a: np.ndarray):
    """scipy-free flood fill over the FULL raster — the oracle."""
    h, w = a.shape
    seen = np.zeros(a.shape, dtype=bool)
    out = []
    for i in range(h):
        for j in range(w):
            if seen[i, j]:
                continue
            v = a[i, j]
            stack = [(i, j)]
            seen[i, j] = True
            px = []
            while stack:
                y, x = stack.pop()
                px.append((y, x))
                for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    ny, nx = y + dy, x + dx
                    if 0 <= ny < h and 0 <= nx < w and not seen[ny, nx] and a[ny, nx] == v:
                        seen[ny, nx] = True
                        stack.append((ny, nx))
            ys = [p[0] for p in px]
            xs = [p[1] for p in px]
            out.append((float(v), len(px), min(ys), min(xs), max(ys), max(xs)))
    return sorted(out)


def _to_tiles(a: np.ndarray, layer: str = "lc") -> pd.DataFrame:
    h, w = a.shape
    rows = []
    for tr in range(h // TILE_W):
        for tc in range(w // TILE_W):
            block = a[tr * TILE_W : (tr + 1) * TILE_W, tc * TILE_W : (tc + 1) * TILE_W]
            rows.append(
                {
                    "layer": layer,
                    "tile_row": tr,
                    "tile_col": tc,
                    "x0": float(tc * TILE_W),
                    "y0": float(tr * TILE_W),
                    "cell_size": 1.0,
                    "tile": block.ravel().astype(np.float32).tolist(),
                }
            )
    return pd.DataFrame(rows)


def _run(spark, a: np.ndarray):
    got = layers.polygonize_regions(
        spark.createDataFrame(_to_tiles(a)), tile_w=TILE_W
    ).collect()
    return sorted((r.value, r.n_px, r.ymin, r.xmin, r.ymax, r.xmax) for r in got)


def test_regions_match_bfs_random(spark):
    rng = np.random.default_rng(99)
    a = rng.integers(0, 3, size=(48, 48)).astype(np.float32)
    assert _run(spark, a) == _bfs_regions(a)


def test_regions_cross_tile_plus_shape(spark):
    """A plus-shape spanning all four tile boundaries must come back as
    ONE region row (the old rectangle decomposition emitted many)."""
    a = np.zeros((32, 32), dtype=np.float32)
    a[14:18, :] = 7.0  # horizontal bar across the vertical tile boundary
    a[:, 14:18] = 7.0  # vertical bar across the horizontal boundary
    got = _run(spark, a)
    want = _bfs_regions(a)
    assert got == want
    sevens = [r for r in got if r[0] == 7.0]
    assert len(sevens) == 1
    assert sevens[0][1] == int((a == 7.0).sum())
    assert sevens[0][2:] == (0, 0, 31, 31)


def test_regions_checkerboard_no_false_merges(spark):
    """4-connectivity: diagonal touches must NOT merge; a 2x2-block
    checkerboard over 4 tiles yields one region per block."""
    base = np.indices((16, 16)).sum(axis=0) % 2
    a = np.kron(base, np.ones((2, 2))).astype(np.float32)  # 32x32
    got = _run(spark, a)
    want = _bfs_regions(a)
    assert got == want
    assert len(got) == 16 * 16  # every 2x2 block separate
