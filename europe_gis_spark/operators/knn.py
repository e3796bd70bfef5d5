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
    big = np.iinfo(np.int64).max
    best_d2 = np.full(n, np.inf)
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
            # sorted ascending so argmin's first-occurrence rule IS the
            # smallest-ordinal tie-break — no extra matrix pass
            idxs = np.sort(np.concatenate(cand).astype(np.int64))
            d2 = (px[:, None] - xs[idxs][None, :]) ** 2 + (
                py[:, None] - ys[idxs][None, :]
            ) ** 2
            j = np.argmin(d2, axis=1)
            d2min = d2[np.arange(n), j]
            ord_min = idxs[j]
            # across rings an equal distance only wins on ordinal
            best_ord = np.where(best_i >= 0, best_i, big)
            better = (d2min < best_d2) | (
                (d2min == best_d2) & (ord_min < best_ord)
            )
            best_d2[better] = d2min[better]
            best_i[better] = ord_min[better]
        # stop when no point can be beaten by ring k+1 (min dist k·size);
        # STRICT bound: a ring-(k+1) centroid at distance exactly best_d
        # with a smaller ordinal must still enter the tie-break
        if np.all((best_i >= 0) & (best_d2 < (k * size) ** 2)):
            break
        k += 1
    best_d = np.sqrt(best_d2)
    return best_i, np.where(best_i >= 0, best_d, np.nan)


def knn_for_cell(
    px: np.ndarray,
    py: np.ndarray,
    cell: int,
    bundle,
    k_neighbors: int,
    max_k: int = 128,
):
    """Vectorized k-nearest-centroids for all points sharing one cell.

    Ring expansion with the k-th-best bound: having probed rings 0..r,
    a point whose CURRENT k-th best distance d_k ≤ r·cell_size cannot
    have any of its true k nearest in ring r+1 (min distance r·size) or
    beyond. Returns (n, k) ordinal + distance arrays, −1/NaN padded,
    each row sorted by (distance, ordinal) for determinism.
    """
    xs, ys, _ids, res, buckets = bundle
    size = gcells.cell_size(res)
    n = len(px)
    acc: list[np.ndarray] = []
    r = 0
    while r <= max_k:
        ring = (
            gcells.grid_ring(cell, r)
            if r > 0
            else np.array([cell], dtype=np.int64)
        )
        cand = [buckets[int(cc)] for cc in ring.tolist() if int(cc) in buckets]
        if cand:
            acc.append(np.concatenate(cand))
        total = sum(len(a) for a in acc)
        if total >= k_neighbors:
            idxs = np.concatenate(acc)
            d2 = (px[:, None] - xs[idxs][None, :]) ** 2 + (
                py[:, None] - ys[idxs][None, :]
            ) ** 2
            kth = np.sqrt(np.partition(d2, k_neighbors - 1, axis=1)[:, k_neighbors - 1])
            # STRICT bound: a ring-(r+1) centroid at distance exactly
            # kth but with a smaller ordinal belongs in the candidate
            # set under the deterministic (distance, ordinal) tie-break
            if np.all(kth < r * size):
                break
        r += 1
    if not acc:
        return (
            np.full((n, k_neighbors), -1, dtype=np.int64),
            np.full((n, k_neighbors), np.nan),
        )
    idxs = np.concatenate(acc)
    d = np.sqrt(
        (px[:, None] - xs[idxs][None, :]) ** 2
        + (py[:, None] - ys[idxs][None, :]) ** 2
    )
    kk = min(k_neighbors, len(idxs))
    # deterministic (distance, ordinal) order
    ord_keys = np.lexsort((idxs[None, :].repeat(n, axis=0), d), axis=1)[:, :kk]
    rows = np.arange(n)[:, None]
    out_i = np.full((n, k_neighbors), -1, dtype=np.int64)
    out_d = np.full((n, k_neighbors), np.nan)
    out_i[:, :kk] = idxs[ord_keys]
    out_d[:, :kk] = d[rows, ord_keys]
    return out_i, out_d


def k_nearest_centroids(
    points: DataFrame,
    bundle_bc,
    k_neighbors: int = 3,
    keep_cols: tuple[str, ...] = ("url",),
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Map-side kNN (k ≥ 1): one output row per (point, rank) with
    rank 1..k ordered by distance (ties by centroid ordinal)."""
    in_cols = list(keep_cols)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in points.select(*in_cols).schema.fields
    ) + ", rank int, settlement_id string, dist double"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bundle = bundle_bc.value
        ids = bundle[2]
        res = bundle[3]
        for b in batches:
            xs = b[x_col].to_numpy(dtype=np.float64, na_value=np.nan)
            ys = b[y_col].to_numpy(dtype=np.float64, na_value=np.nan)
            ok = np.isfinite(xs) & np.isfinite(ys)
            frames = []
            if ok.any():
                pcell = gcells.cell_id(
                    np.where(ok, xs, 0.0), np.where(ok, ys, 0.0), res
                )
                ok_idx = np.nonzero(ok)[0]
                cells_ok = pcell[ok_idx]
                for c in np.unique(cells_ok):
                    m = ok_idx[cells_ok == c]
                    bi, bd = knn_for_cell(xs[m], ys[m], int(c), bundle, k_neighbors)
                    for rk in range(k_neighbors):
                        hit = bi[:, rk] >= 0
                        if not hit.any():
                            continue
                        rows = m[hit]
                        f = b[in_cols].iloc[rows].copy()
                        f["rank"] = np.int32(rk + 1)
                        f["settlement_id"] = [ids[i] for i in bi[hit, rk]]
                        f["dist"] = bd[hit, rk]
                        frames.append(f)
            if frames:
                yield pd.concat(frames, ignore_index=True)
            else:
                yield pd.DataFrame(
                    {
                        **{c: pd.Series(dtype=b[c].dtype) for c in in_cols},
                        "rank": pd.Series(dtype=np.int32),
                        "settlement_id": pd.Series(dtype=object),
                        "dist": pd.Series(dtype=float),
                    }
                )

    return points.mapInPandas(fn, schema=out_schema)


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


def within_distance_join(
    left: "DataFrame",
    right: "DataFrame",
    dist: float,
    left_cols: tuple[str, ...] = ("event_id",),
    right_cols: tuple[str, ...] = ("anchor_id",),
) -> "DataFrame":
    """Spatial ε-join: every (left, right) pair with Euclidean distance
    ≤ ``dist`` — the ST_DWithin analogue, as a SHUFFLE join (neither
    side needs to fit in memory, unlike the broadcast kNN path).

    Grid-hash join at cell size = dist: each left point keeps its own
    cell, each right point replicates to its 3×3 cell neighborhood, the
    join is a plain equi-join on the cell key + exact d² refine. A
    qualifying pair meets in EXACTLY one bucket (the left point's
    cell), so no distinct pass; right-side blowup is a fixed 9×
    (tens of bytes per row). Work scales with occupancy of matching
    cells, never |left|·|right|. Pure column ops, codegen throughout.
    """
    from pyspark.sql import functions as F

    d = float(dist)
    if not d > 0.0:
        raise ValueError(
            f"dist must be positive, got {dist!r} — cell size = dist is "
            "a divisor; dist=0 would degenerate to a cross join"
        )
    lb = left.select(
        *left_cols,
        F.col("x").alias("_lx"),
        F.col("y").alias("_ly"),
        F.floor(F.col("x") / d).cast("long").alias("_bx"),
        F.floor(F.col("y") / d).cast("long").alias("_by"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(i).alias("dx"), F.lit(j).alias("dy"))
            for i in (-1, 0, 1)
            for j in (-1, 0, 1)
        ]
    )
    rb = (
        right.withColumn("_o", F.explode(offsets))
        .select(
            *right_cols,
            F.col("x").alias("_rx"),
            F.col("y").alias("_ry"),
            (F.floor(F.col("x") / d).cast("long") + F.col("_o.dx")).alias("_bx"),
            (F.floor(F.col("y") / d).cast("long") + F.col("_o.dy")).alias("_by"),
        )
    )
    d2 = (F.col("_lx") - F.col("_rx")) ** 2 + (F.col("_ly") - F.col("_ry")) ** 2
    return (
        lb.join(rb, ["_bx", "_by"])
        .filter(d2 <= F.lit(d * d))
        .select(*left_cols, *right_cols, F.sqrt(d2).alias("dist"))
    )
