"""Multi-layer raster algebra: align join, validation mask, map algebra,
polygonize, grid snapping (J8, W5, F9, F10, F15).

Reference semantics:
  * align = ``np.stack([a, b, c], axis=-1)`` pixel-position alignment
    (``/root/reference/scripts/jobs/dataset_creation.py:126,153,200``;
    ``src/model_serving/main.py:17-20``) → n-way equi-join on (y, x) —
    i.e. a wide table with one column per layer.
  * validation mask = 1 iff every input layer valid and output valid —
    the reference's nested per-pixel loop
    (``src/feature_engineering/raster_preprocessor.py:93-114``) becomes
    ONE loop-free column expression.
  * map algebra = arbitrary expressions over aligned columns
    (``ST_MapAlgebra``, ``scripts/old_files/sql/rasterize_gpop.sql:3-6``).
  * polygonize = constant-value regions → rectangle polygons per tile
    (``features.shapes``, ``scripts/jobs/process_raster_layer.py:99-117``)
    via greedy row-run merging inside applyInPandas (a UDTF: many rows
    out per tile).
  * grid snapping (``RoundBoundingBox``,
    ``process_raster_layer.py:75-87``) as pure column arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

BAD_VALUE = -1000.0


def align_layers(cells: DataFrame, layers: list[str]) -> DataFrame:
    """J8: long (layer, y, x, value) → wide (y, x, <layer>…) via pivot
    (single shuffle; equivalent to an n-way self-join on (y, x) but one
    pass). Missing pixels become NULL."""
    return (
        cells.filter(F.col("layer").isin(layers))
        .groupBy("y", "x")
        .pivot("layer", layers)
        .agg(F.first("value"))
    )


def validation_mask(
    wide: DataFrame, in_layers: list[str], out_layer: str, bad: float = BAD_VALUE
) -> DataFrame:
    """W5: valid ⇔ all inputs > bad AND output > -1 — loop-free form of
    raster_preprocessor.py:106-109."""
    cond = F.lit(True)
    for l in in_layers:
        cond = cond & (F.col(l) > bad)
    cond = cond & (F.col(out_layer) > -1)
    return wide.withColumn("valid_mask", F.when(cond, 1).otherwise(0))


def map_algebra(wide: DataFrame, expr: str, out_col: str = "result") -> DataFrame:
    """F15: SQL expression over aligned layer columns."""
    return wide.withColumn(out_col, F.expr(expr))


def snap_bounds(
    xmin: float, ymin: float, xmax: float, ymax: float, res: float, pad_cells: int = 0
) -> tuple[float, float, float, float]:
    """F10: modulo-snap a bbox outward to the resolution grid + padding
    (RoundBoundingBox, process_raster_layer.py:75-87)."""
    pad = pad_cells * res
    return (
        float(np.floor(xmin / res) * res - pad),
        float(np.floor(ymin / res) * res - pad),
        float(np.ceil(xmax / res) * res + pad),
        float(np.ceil(ymax / res) * res + pad),
    )


POLYGONIZE_SCHEMA = (
    "layer string, value double, wkb binary, y0 int, x0 int, height int, width int"
)


def polygonize(tiles: DataFrame, tile_w: int = 16) -> DataFrame:
    """F9: constant-value connected regions → rectangle polygons.

    Greedy maximal-rectangle decomposition per tile (row-run merge):
    every pixel belongs to exactly one emitted rectangle of equal value,
    so Σ rect areas per value == pixel count per value (tested). An
    applyInPandas UDTF — many geometry rows out per tile row in.
    """
    from ..geo import wkb as gwkb

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        layer, trow, tcol = key
        rows = []
        for t in pdf.itertuples():
            a = np.asarray(t.tile, dtype=np.float32).reshape(tile_w, tile_w)
            used = np.zeros_like(a, dtype=bool)
            for i in range(tile_w):
                j = 0
                while j < tile_w:
                    if used[i, j]:
                        j += 1
                        continue
                    v = a[i, j]
                    # extend run rightwards
                    j2 = j
                    while j2 + 1 < tile_w and not used[i, j2 + 1] and a[i, j2 + 1] == v:
                        j2 += 1
                    # extend block downwards while the whole run matches
                    i2 = i
                    while i2 + 1 < tile_w and np.all(
                        (~used[i2 + 1, j : j2 + 1]) & (a[i2 + 1, j : j2 + 1] == v)
                    ):
                        i2 += 1
                    used[i : i2 + 1, j : j2 + 1] = True
                    h, w = i2 - i + 1, j2 - j + 1
                    gx = t.x0 + j * t.cell_size
                    gy = t.y0 + i * t.cell_size
                    ring = np.array(
                        [
                            [gx, gy],
                            [gx + w * t.cell_size, gy],
                            [gx + w * t.cell_size, gy + h * t.cell_size],
                            [gx, gy + h * t.cell_size],
                            [gx, gy],
                        ]
                    )
                    rows.append(
                        (
                            layer,
                            float(v),
                            gwkb.encode_polygon([ring]),
                            int(trow * tile_w + i),
                            int(tcol * tile_w + j),
                            h,
                            w,
                        )
                    )
                    j = j2 + 1
        return pd.DataFrame(
            rows, columns=["layer", "value", "wkb", "y0", "x0", "height", "width"]
        )

    return tiles.groupBy("layer", "tile_row", "tile_col").applyInPandas(
        fn, schema=POLYGONIZE_SCHEMA
    )


# ---------------------------------------------------------------- F9 exact
# connected-region polygonize (features.shapes semantics): one row per
# 4-connected constant-value region, across tile boundaries.

_CC_SCHEMA = (
    "kind int, layer string, tile_row int, tile_col int, local_id int, "
    "value double, n_px int, ymin int, xmin int, ymax int, xmax int, "
    "vert boolean, pos int"
)


def _label_tile(a: np.ndarray, tile_w: int) -> np.ndarray:
    """Two-pass 4-connectivity labeling of equal-value pixels (no scipy):
    row runs get provisional labels, vertical merges go through a tiny
    union-find over runs."""
    labels = np.zeros((tile_w, tile_w), dtype=np.int32)
    parent: list[int] = [0]  # 1-based labels; parent[0] unused

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nxt = 1
    for i in range(tile_w):
        j = 0
        while j < tile_w:
            j2 = j
            v = a[i, j]
            while j2 + 1 < tile_w and a[i, j2 + 1] == v:
                j2 += 1
            # labels of the row above overlapping this run with equal value
            lab = 0
            if i > 0:
                above = labels[i - 1, j : j2 + 1][a[i - 1, j : j2 + 1] == v]
                for u in np.unique(above):
                    u = find(int(u))
                    if lab == 0:
                        lab = u
                    elif u != lab:
                        parent[u] = lab  # merge
            if lab == 0:
                parent.append(nxt)
                lab = nxt
                nxt += 1
            labels[i, j : j2 + 1] = lab
            j = j2 + 1
    # path-compress to roots, then densify to 1..k
    flat = labels.ravel()
    roots = np.array([find(int(x)) for x in flat], dtype=np.int32)
    _, dense = np.unique(roots, return_inverse=True)
    return (dense + 1).astype(np.int32).reshape(tile_w, tile_w)


def polygonize_regions(tiles: DataFrame, tile_w: int = 16) -> DataFrame:
    """F9 with exact ``features.shapes`` region semantics
    (``scripts/jobs/process_raster_layer.py:99-117``): ONE row per
    4-connected constant-value region — including regions that span tile
    boundaries — with pixel count and bbox. (Geometry output stays the
    rectangle decomposition of :func:`polygonize`; join it on the same
    tiles to reconstruct region shapes.)

    Plan: per-tile two-pass connected-component labeling inside one
    ``applyInPandas`` (shared by region rows and boundary strips via the
    reused groupBy exchange), then cross-tile label equivalences from
    matching boundary pixels. The equivalence graph is merged with a
    driver-side union-find: its size is O(region crossings of tile
    borders) — perimeter-scale, orders of magnitude below pixel count
    (the same small-side-collect pattern as the broadcast polygon
    index). The merged local→global map is broadcast back and the final
    per-region aggregation is one partial+final hash agg.
    """
    spark = tiles.sparkSession

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        layer, trow, tcol = key
        rows = []
        for t in pdf.itertuples():
            a = np.asarray(t.tile, dtype=np.float32).reshape(tile_w, tile_w)
            lab = _label_tile(a, tile_w)
            for lid in np.unique(lab):
                m = lab == lid
                ys, xs = np.nonzero(m)
                rows.append(
                    (
                        0, layer, int(trow), int(tcol), int(lid),
                        float(a[ys[0], xs[0]]), int(m.sum()),
                        int(ys.min()), int(xs.min()), int(ys.max()), int(xs.max()),
                        None, None,
                    )
                )
            # boundary strips: east column (vert boundary with col+1) and
            # south row (horiz boundary with row+1); the neighbor emits
            # its west/north strip under the SAME (tile_row,tile_col) key
            for p in range(tile_w):
                rows.append((1, layer, int(trow), int(tcol), int(lab[p, -1]),
                             float(a[p, -1]), None, None, None, None, None, True, p))
                rows.append((2, layer, int(trow), int(tcol), int(lab[p, 0]),
                             float(a[p, 0]), None, None, None, None, None, True, p))
                rows.append((1, layer, int(trow), int(tcol), int(lab[-1, p]),
                             float(a[-1, p]), None, None, None, None, None, False, p))
                rows.append((2, layer, int(trow), int(tcol), int(lab[0, p]),
                             float(a[0, p]), None, None, None, None, None, False, p))
        return pd.DataFrame(
            rows,
            columns=[
                "kind", "layer", "tile_row", "tile_col", "local_id", "value",
                "n_px", "ymin", "xmin", "ymax", "xmax", "vert", "pos",
            ],
        )

    # three consumers (boundary pairs collect, lo strips, region rows) —
    # persist so the labeling UDF runs once; the tagged table is
    # region+perimeter-scale (≈ regions + 4·tile_w rows per tile), not
    # pixel-scale, so MEMORY_AND_DISK is safe at raster scale
    from pyspark import StorageLevel

    tagged = (
        tiles.groupBy("layer", "tile_row", "tile_col")
        .applyInPandas(fn, schema=_CC_SCHEMA)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    regions = tagged.filter(F.col("kind") == 0)

    # equivalences: east strip of (r,c) meets west strip of (r,c+1);
    # south strip of (r,c) meets north strip of (r+1,c)
    lo = tagged.filter(F.col("kind") == 1).select(
        "layer", "tile_row", "tile_col", "vert", "pos", "value",
        F.col("local_id").alias("lid_a"),
    )
    hi = tagged.filter(F.col("kind") == 2).select(
        "layer",
        F.when(F.col("vert"), F.col("tile_row")).otherwise(F.col("tile_row") - 1).alias("tile_row"),
        F.when(F.col("vert"), F.col("tile_col") - 1).otherwise(F.col("tile_col")).alias("tile_col"),
        "vert", "pos", "value",
        F.col("local_id").alias("lid_b"),
    )
    pairs = (
        lo.join(hi, ["layer", "tile_row", "tile_col", "vert", "pos", "value"])
        .select(
            "layer", "tile_row", "tile_col", "vert", "lid_a", "lid_b"
        )
        .distinct()
        .collect()
    )

    # driver union-find over (layer, trow, tcol, local_id) keys
    parent: dict = {}

    def find(k):
        r = k
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(k, k) != k:
            parent[k], k = r, parent[k]
        return r

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for p in pairs:
        a = (p.layer, p.tile_row, p.tile_col, p.lid_a)
        b = (
            (p.layer, p.tile_row, p.tile_col + 1, p.lid_b)
            if p.vert
            else (p.layer, p.tile_row + 1, p.tile_col, p.lid_b)
        )
        union(a, b)
    merged = {k: find(k) for k in list(parent)}
    bc = spark.sparkContext.broadcast(merged)

    def to_global(it):
        for b in it:
            m = bc.value
            rid = [
                "{}|{}|{}|{}".format(
                    *m.get((la, tr, tc, li), (la, tr, tc, li))
                )
                for la, tr, tc, li in zip(
                    b["layer"], b["tile_row"], b["tile_col"], b["local_id"]
                )
            ]
            out = b[["layer", "value", "n_px"]].copy()
            out["region_id"] = rid
            out["ymin"] = b["tile_row"] * tile_w + b["ymin"]
            out["xmin"] = b["tile_col"] * tile_w + b["xmin"]
            out["ymax"] = b["tile_row"] * tile_w + b["ymax"]
            out["xmax"] = b["tile_col"] * tile_w + b["xmax"]
            yield out

    out_schema = (
        "layer string, value double, n_px int, region_id string, "
        "ymin int, xmin int, ymax int, xmax int"
    )
    result = (
        regions.mapInPandas(to_global, schema=out_schema)
        .groupBy("layer", "region_id")
        .agg(
            F.first("value").alias("value"),
            F.sum("n_px").cast("long").alias("n_px"),
            F.min("ymin").alias("ymin"),
            F.min("xmin").alias("xmin"),
            F.max("ymax").alias("ymax"),
            F.max("xmax").alias("xmax"),
        )
        # region rows are tiny: materialize them eagerly so the persist
        # below can be released instead of leaking one cached dataset
        # per invocation into the session's block manager
        .localCheckpoint(eager=True)
    )
    tagged.unpersist()
    return result
