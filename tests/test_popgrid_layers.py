"""Population-grid pipeline (CSV scan, union, attribute join, overlay
area weights, zonal sums) and layer algebra (align, mask, polygonize)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from europe_gis_spark.datagen import geodata
from europe_gis_spark.geo import geom, wkb
from europe_gis_spark.operators import layers, popgrid, zonal


@pytest.fixture(scope="module")
def grid_attrs(tmp_path_factory):
    grid, a1, a2 = geodata.pop_grid()
    d = tmp_path_factory.mktemp("csv")
    p1, p2 = str(d / "a1.csv"), str(d / "a2.csv")
    a1.to_csv(p1, index=False)
    a2.to_csv(p2, index=False)
    return grid, a1, a2, p1, p2


def test_csv_union_attribute_join(spark, grid_attrs):
    grid, a1, a2, p1, p2 = grid_attrs
    attrs = popgrid.read_attr_csvs(spark, [p1, p2])
    assert attrs.count() == len(a1) + len(a2)
    gdf = spark.createDataFrame(grid[["grd_id", "x0", "y0"]])
    joined = popgrid.attribute_join(gdf, attrs)
    assert joined.count() == len(grid)  # left join keeps all cells
    # missing attrs → 0, present attrs → exact value
    want = dict(zip(pd.concat([a1, a2]).grd_id, pd.concat([a1, a2]).tot_p))
    got = {r.grd_id: r.tot_p for r in joined.collect()}
    for gid, v in got.items():
        assert v == want.get(gid, 0)


def test_overlay_zonal_population_matches_bruteforce(spark, grid_attrs):
    grid, a1, a2, p1, p2 = grid_attrs
    # zones: two level-1 halves + one diagonal triangle region
    ap = geodata.admin_polygons()
    zones = ap[(ap.levl_code == 1) & (ap.cntr_code == "AA")]
    polys = [(r.nuts_id, r.geometry) for r in zones.itertuples()]
    gdf = spark.createDataFrame(grid[["grd_id", "x0", "y0"]])
    attrs = popgrid.read_attr_csvs(spark, [p1, p2])
    joined = popgrid.attribute_join(gdf, attrs)
    weights = popgrid.overlay_weights(gdf, polys)
    got = {r.zone_id: r.pop_sum for r in popgrid.zonal_population(joined, weights).collect()}

    # brute force: every 1km cell is fully inside one half (AA1 or AA2)
    attrs_all = pd.concat([a1, a2])
    want = {"AA1": 0.0, "AA2": 0.0}
    amap = dict(zip(attrs_all.grd_id, attrs_all.tot_p))
    for r in grid.itertuples():
        tot = amap.get(r.grd_id, 0)
        half = "AA1" if r.x0 < geodata.AA_X0 + 30_000.0 else "AA2"
        want[half] += float(tot)
    assert got["AA1"] == pytest.approx(want["AA1"], abs=1e-6)
    assert got["AA2"] == pytest.approx(want["AA2"], abs=1e-6)


def test_overlay_fractional_weights(spark):
    """A zone that covers exactly half of each of two cells."""
    grid = pd.DataFrame(
        {"grd_id": ["c1", "c2"], "x0": [0.0, 1000.0], "y0": [0.0, 0.0]}
    )
    half_rect = wkb.encode_polygon(
        [np.array([[0.0, 0.0], [2000.0, 0.0], [2000.0, 500.0], [0.0, 500.0], [0.0, 0.0]])]
    )
    gdf = spark.createDataFrame(grid)
    w = popgrid.overlay_weights(gdf, [("Z", half_rect)], res=18).collect()
    got = {(r.grd_id, r.zone_id): r.area_frac for r in w}
    assert got[("c1", "Z")] == pytest.approx(0.5)
    assert got[("c2", "Z")] == pytest.approx(0.5)


def test_overlay_intersection_geometry(spark):
    """J3 geometry output: the clipped WKB decodes to a polygon fully
    inside the cell square whose exact area equals the area-weight path;
    holes survive the clip."""
    grid = pd.DataFrame(
        {"grd_id": ["c1", "c2"], "x0": [0.0, 1000.0], "y0": [0.0, 0.0]}
    )
    half_rect = wkb.encode_polygon(
        [np.array([[0.0, 0.0], [2000.0, 0.0], [2000.0, 500.0], [0.0, 500.0], [0.0, 0.0]])]
    )
    # donut: outer square over both cells, square hole in its middle
    donut = wkb.encode_multipolygon(
        [
            [
                np.array([[100.0, 100.0], [1900.0, 100.0], [1900.0, 900.0],
                          [100.0, 900.0], [100.0, 100.0]]),
                np.array([[800.0, 300.0], [800.0, 700.0], [1200.0, 700.0],
                          [1200.0, 300.0], [800.0, 300.0]]),  # CW hole
            ]
        ]
    )
    gdf = spark.createDataFrame(grid)
    rows = popgrid.overlay_intersection(
        gdf, [("Z", half_rect), ("D", donut)], res=18
    ).collect()
    got = {(r.grd_id, r.zone_id): r for r in rows}
    # area parity with the weights path
    w = popgrid.overlay_weights(gdf, [("Z", half_rect), ("D", donut)], res=18).collect()
    fr = {(r.grd_id, r.zone_id): r.area_frac for r in w}
    assert set(got) == set(fr)
    for key, r in got.items():
        assert r.area == pytest.approx(fr[key] * 1000.0 * 1000.0)
        parts = wkb.polygon_parts(wkb.decode(bytes(r.geometry)))
        assert geom.polygon_area(parts) == pytest.approx(r.area)
        cx0 = 0.0 if key[0] == "c1" else 1000.0
        for rings in parts:
            for ring in rings:
                assert (ring[:, 0] >= cx0 - 1e-9).all()
                assert (ring[:, 0] <= cx0 + 1000.0 + 1e-9).all()
                assert (ring[:, 1] >= -1e-9).all() and (ring[:, 1] <= 1000.0 + 1e-9).all()
    # the donut's hole reduces the clipped area in each cell:
    # per cell, outer 900x800 strip minus the 200x400 half-hole
    assert got[("c1", "D")].area == pytest.approx(900 * 800 - 200 * 400)
    assert got[("c2", "D")].area == pytest.approx(900 * 800 - 200 * 400)
    assert len(wkb.polygon_parts(wkb.decode(bytes(got[("c1", "D")].geometry)))[0]) == 2


@pytest.fixture(scope="module")
def cells_df(spark):
    tiles = geodata.raster_tiles()
    return zonal.tiles_to_cells(spark.createDataFrame(tiles), tile_w=16)


def test_align_and_validation_mask(spark, cells_df):
    wide = layers.align_layers(cells_df, ["dem", "pop", "ww"])
    masked = layers.validation_mask(wide, ["dem", "pop"], "ww")
    got = masked.filter("y < 40 and x < 60").toPandas()
    for r in got.sample(200, random_state=3).itertuples():
        want = int(r.dem > -1000.0 and r.pop > -1000.0 and r.ww > -1)
        assert r.valid_mask == want
    # map algebra over aligned layers (F15)
    alg = layers.map_algebra(wide, "dem * 2 + coalesce(ww, 0)", "alg").limit(5)
    assert alg.count() == 5


def test_polygonize_partitions_pixels_exactly(spark):
    tiles = geodata.raster_tiles()
    df = spark.createDataFrame(tiles[tiles.layer == "ww"])
    polys = layers.polygonize(df, tile_w=16).toPandas()
    # every pixel covered exactly once: Σ h·w per value == pixel count
    per_val = polys.groupby("value").apply(
        lambda g: (g.height * g.width).sum(), include_groups=False
    )
    full = np.concatenate([np.array(t, dtype=np.float32) for t in tiles[tiles.layer == "ww"].tile])
    import collections

    counts = collections.Counter(full.tolist())
    for v, n in counts.items():
        assert per_val[v] == n
    # geometry sanity: rect area == h*w*cell_size²
    r = polys.iloc[0]
    g = wkb.decode(bytes(r.wkb))
    assert geom.polygon_area(wkb.polygon_parts(g)) == pytest.approx(
        r.height * r.width * 1000.0 * 1000.0
    )


def test_snap_bounds():
    assert layers.snap_bounds(13.0, 27.0, 94.0, 101.0, 25.0, pad_cells=1) == (
        -25.0, 0.0, 125.0, 150.0,
    )
