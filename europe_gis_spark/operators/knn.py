"""kNN to nearest settlement centroid via cell-ring expansion (J9).

Generalizes the reference's nearest/center label lookup
(``/root/reference/scripts/jobs/dataset_creation.py:69,134,179``;
3×3-max variant ``sequence_separator.py:32``) to true nearest-neighbor
search, per the north star: iterative ``grid_disk`` ring expansion over
the planar cell grid until the nearest candidate is provably found.

Scale shape: settlements (≤ 1e6) are bucketed by cell into a broadcast
structure; the page side probes rings map-side — no shuffle. Python work
is per *unique cell*, not per row: all points in a cell share the same
candidate rings, and distances are computed vectorized. With realistic
skew (dense city cells) a batch of 10⁵ points touches only O(10²) cells.

Termination proof: points in cells at Chebyshev ring r from cell c are
at Euclidean distance ≥ (r−1)·cell_size from any point in c. Having
probed rings 0..k, a point whose current best distance d ≤ k·cell_size
cannot be beaten by ring k+1 (min distance k·cell_size) or beyond.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..geo import cells as gcells


def build_centroid_buckets(
    xs: np.ndarray, ys: np.ndarray, ids: list, res: int = gcells.RES_COARSE
):
    """Bucket centroids by cell id → picklable bundle for sc.broadcast."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    cid = gcells.cell_id(xs, ys, res)
    buckets: dict[int, np.ndarray] = {}
    order = np.argsort(cid, kind="stable")
    sorted_cid = cid[order]
    edges = np.nonzero(np.diff(sorted_cid))[0] + 1
    for chunk in np.split(order, edges):
        buckets[int(cid[chunk[0]])] = chunk.astype(np.int32)
    return (xs, ys, list(ids), res, buckets)


def nearest_for_cell(
    px: np.ndarray, py: np.ndarray, cell: int, bundle, max_k: int = 128
):
    """Vectorized nearest-centroid for all points sharing one cell.

    Returns (ordinals int array, dists float array); ordinal −1 = none
    found within max_k rings.
    """
    xs, ys, _ids, res, buckets = bundle
    size = gcells.cell_size(res)
    n = len(px)
    best_d = np.full(n, np.inf)
    best_i = np.full(n, -1, dtype=np.int64)
    k = 0
    while k <= max_k:
        ring = (
            gcells.grid_ring(cell, k)
            if k > 0
            else np.array([cell], dtype=np.int64)
        )
        cand = [buckets[int(cc)] for cc in ring.tolist() if int(cc) in buckets]
        if cand:
            idxs = np.concatenate(cand)
            d2 = (px[:, None] - xs[idxs][None, :]) ** 2 + (
                py[:, None] - ys[idxs][None, :]
            ) ** 2
            j = np.argmin(d2, axis=1)
            dj = np.sqrt(d2[np.arange(n), j])
            better = dj < best_d
            best_d[better] = dj[better]
            best_i[better] = idxs[j[better]]
        # stop when no point can be beaten by ring k+1 (min dist k·size)
        if np.all((best_i >= 0) & (best_d <= k * size)):
            break
        k += 1
    return best_i, np.where(best_i >= 0, best_d, np.nan)


def nearest_centroid(
    points: DataFrame,
    bundle_bc,
    keep_cols: tuple[str, ...] = ("url",),
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Map-side kNN(k=1): adds (settlement_id, dist) columns."""
    in_cols = list(keep_cols) + [x_col, y_col]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in points.select(*in_cols).schema.fields
    ) + ", settlement_id string, dist double"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bundle = bundle_bc.value
        ids = bundle[2]
        res = bundle[3]
        for b in batches:
            n = len(b)
            out_id = np.array([None] * n, dtype=object)
            out_d = np.full(n, np.nan)
            xs = b[x_col].to_numpy(dtype=np.float64, na_value=np.nan)
            ys = b[y_col].to_numpy(dtype=np.float64, na_value=np.nan)
            ok = np.isfinite(xs) & np.isfinite(ys)
            if ok.any():
                pcell = gcells.cell_id(
                    np.where(ok, xs, 0.0), np.where(ok, ys, 0.0), res
                )
                ok_idx = np.nonzero(ok)[0]
                cells_ok = pcell[ok_idx]
                for c in np.unique(cells_ok):
                    m = ok_idx[cells_ok == c]
                    bi, bd = nearest_for_cell(xs[m], ys[m], int(c), bundle)
                    for t, (i2, d2) in enumerate(zip(bi, bd)):
                        if i2 >= 0:
                            out_id[m[t]] = ids[i2]
                            out_d[m[t]] = d2
            out = b[in_cols].copy()
            out["settlement_id"] = out_id
            out["dist"] = out_d
            yield out

    return points.mapInPandas(fn, schema=out_schema)
