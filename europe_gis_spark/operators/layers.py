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
