"""2-D sliding-window patch extraction + batched inference hooks
(W1–W5, O1–O5) — tile-grouped ``applyInPandas`` with halo exchange.

The reference extracts all w×w patches of whole-in-memory rasters with
Python loops (``/root/reference/scripts/jobs/dataset_creation.py:20-80``)
and batches 100 windows per ``model.predict``
(``scripts/jobs/model_prediction.py:33-63``). The engine re-expresses
both over the tiled raster table:

  * halo exchange: each tile needs a (w−1)-pixel apron from its E/S/SE
    neighbors; rather than shuffling whole neighbor tiles, each tile
    pre-emits its apron strips keyed by the receiving tile — one narrow
    shuffle, then one ``applyInPandas`` per assembled tile does all the
    numpy stride-tricks work (zero per-row Python).
  * window validity (W2) = 2-D min filter > bad_value inside the UDF —
    same rule as ``np.amin(win) > threshold``
    (``dataset_creation.py:26,64,131``).
  * labeling (W3) = center pixel of the label layer.
  * batched inference (W4) = ``mapInPandas`` over the patch table with a
    broadcast model callable (Arrow batch ≈ the reference's 100-window
    stack).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

BAD_VALUE = -1000.0


def tile_with_halo(tiles: DataFrame, tile_w: int, win: int) -> DataFrame:
    """Attach E/S/SE halo strips to every tile.

    Emits each tile under its own key plus apron contributions to its
    W/N/NW neighbors (the tiles whose windows overhang into it), then
    groups — the classic stencil halo exchange as one groupBy shuffle of
    narrow strips.
    Output: (layer, tile_row, tile_col, part, dr, dc, block) rows ready
    for assemble inside extract_patches.
    """
    h = win - 1
    strips = []
    base = tiles.select(
        "layer",
        "tile_row",
        "tile_col",
        F.lit(0).alias("dr"),
        F.lit(0).alias("dc"),
        F.col("tile").alias("block"),
    )
    strips.append(base)
    if h > 0:
        # this tile is the EAST halo of (tile_col-1): receiver gets dr=0, dc=1
        strips.append(
            tiles.select(
                "layer",
                "tile_row",
                (F.col("tile_col") - 1).alias("tile_col"),
                F.lit(0).alias("dr"),
                F.lit(1).alias("dc"),
                F.col("tile").alias("block"),
            ).filter(F.col("tile_col") >= 0)
        )
        strips.append(
            tiles.select(
                "layer",
                (F.col("tile_row") - 1).alias("tile_row"),
                "tile_col",
                F.lit(1).alias("dr"),
                F.lit(0).alias("dc"),
                F.col("tile").alias("block"),
            ).filter(F.col("tile_row") >= 0)
        )
        strips.append(
            tiles.select(
                "layer",
                (F.col("tile_row") - 1).alias("tile_row"),
                (F.col("tile_col") - 1).alias("tile_col"),
                F.lit(1).alias("dr"),
                F.lit(1).alias("dc"),
                F.col("tile").alias("block"),
            ).filter((F.col("tile_row") >= 0) & (F.col("tile_col") >= 0))
        )
    out = strips[0]
    for s in strips[1:]:
        out = out.unionByName(s)
    return out


PATCH_SCHEMA = (
    "layer string, i int, j int, label float, patch array<float>, valid boolean"
)


def extract_patches(
    tiles: DataFrame,
    tile_w: int = 16,
    win: int = 5,
    label_layer: str | None = None,
    min_valid: float = BAD_VALUE,
) -> DataFrame:
    """All w×w patches per layer (stride 1) with validity + center label.

    groupBy (layer, tile_row, tile_col) over halo-augmented strips, then
    numpy ``sliding_window_view`` inside one applyInPandas — the
    distributed form of dataset_creation.py:20-36.
    """
    halo = tile_with_halo(tiles, tile_w, win)
    h = win - 1

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        layer, trow, tcol = key
        big = np.full((tile_w + h, tile_w + h), BAD_VALUE, dtype=np.float32)
        for r in pdf.itertuples():
            block = np.asarray(r.block, dtype=np.float32).reshape(tile_w, tile_w)
            r0, c0 = r.dr * tile_w, r.dc * tile_w
            seg = big[r0 : r0 + tile_w, c0 : c0 + tile_w]
            big[r0 : r0 + tile_w, c0 : c0 + tile_w] = block[: seg.shape[0], : seg.shape[1]]
        sw = np.lib.stride_tricks.sliding_window_view(big, (win, win))
        sw = sw[:tile_w, :tile_w]  # origins inside this tile
        n = tile_w * tile_w
        patches = sw.reshape(n, win * win)
        valid = patches.min(axis=1) > min_valid
        ii, jj = np.meshgrid(np.arange(tile_w), np.arange(tile_w), indexing="ij")
        center = big[
            (ii + win // 2).ravel(), (jj + win // 2).ravel()
        ]
        return pd.DataFrame(
            {
                "layer": layer,
                "i": (trow * tile_w + ii.ravel()).astype(np.int32),
                "j": (tcol * tile_w + jj.ravel()).astype(np.int32),
                "label": center.astype(np.float32),
                "patch": list(patches),
                "valid": valid,
            }
        )

    return halo.groupBy("layer", "tile_row", "tile_col").applyInPandas(
        fn, schema=PATCH_SCHEMA
    )


def stratified_sample(
    patches: DataFrame, fractions: dict, label_col: str = "label_bucket", seed: int = 42
) -> DataFrame:
    """O5: per-class sampling (sampleBy — seeded, reproducible)."""
    return patches.sampleBy(label_col, fractions, seed)


def train_test_split(df: DataFrame, test_frac: float = 0.2, seed: int = 42):
    """O4: 80/20 split (dataset_creation.py:32-35)."""
    train, test = df.randomSplit([1.0 - test_frac, test_frac], seed)
    return train, test


def batched_inference(
    patches: DataFrame,
    predict_fn: Callable[[np.ndarray], np.ndarray],
    feature_col: str = "patch",
    out_col: str = "pred",
) -> DataFrame:
    """W4: Arrow-batched inference over the patch table (mapInPandas);
    ``predict_fn`` is a broadcastable callable (model.predict analogue,
    model_prediction.py:33-63)."""
    in_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in patches.schema.fields
    )
    schema = in_fields + f", {out_col} double"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            mat = np.array(b[feature_col].tolist(), dtype=np.float32)
            out = b.copy()
            out[out_col] = np.asarray(predict_fn(mat), dtype=np.float64)
            yield out

    return patches.mapInPandas(fn, schema=schema)
