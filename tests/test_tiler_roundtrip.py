"""Tiler ingest roundtrip (S11) and per-tile union (G10)."""

import numpy as np
import pandas as pd

from europe_gis_spark.datagen import geodata
from europe_gis_spark.operators import zonal


def test_cells_to_tiles_roundtrip(spark):
    tiles = geodata.raster_tiles()
    df = spark.createDataFrame(tiles[tiles.layer == "dem"])
    cells = zonal.tiles_to_cells(df, tile_w=16)
    back = zonal.cells_to_tiles(cells, tile_w=16).toPandas()
    want = {
        (r.tile_row, r.tile_col): np.array(r.tile, dtype=np.float32)
        for r in tiles[tiles.layer == "dem"].itertuples()
    }
    assert len(back) == len(want)
    for r in back.itertuples():
        np.testing.assert_array_equal(
            np.array(r.tile, dtype=np.float32), want[(r.tile_row, r.tile_col)]
        )


def test_per_tile_union(spark):
    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                "tile_row": [0, 0, 0, 1],
                "tile_col": [0, 0, 1, 1],
                "value": [2.0, 3.0, 5.0, 7.0],
            }
        )
    )
    got = {
        (r.tile_row, r.tile_col): (r.n_burns, r.sum_value, r.max_value)
        for r in zonal.per_tile_union(pairs).collect()
    }
    assert got == {(0, 0): (2, 5.0, 3.0), (0, 1): (1, 5.0, 5.0), (1, 1): (1, 7.0, 7.0)}
