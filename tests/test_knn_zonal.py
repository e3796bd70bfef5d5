"""kNN ring expansion vs exhaustive oracle; zonal aggs vs numpy oracle."""

import numpy as np
import pandas as pd
import pytest

from europe_gis_spark.datagen import geodata
from europe_gis_spark.datagen.hashing import uniform
from europe_gis_spark.operators import knn, zonal


@pytest.fixture(scope="module")
def settle():
    return geodata.settlements()


def test_knn_matches_exhaustive(spark, settle):
    ids = np.arange(400, dtype=np.uint64)
    px = geodata.AA_X0 - 5_000.0 + uniform(ids, 7, 1) * (geodata.AA_W + 50_000.0)
    py = geodata.AA_Y0 - 5_000.0 + uniform(ids, 7, 2) * (geodata.AA_H + 20_000.0)
    pts = pd.DataFrame({"url": [f"p{i}" for i in range(400)], "x": px, "y": py})

    bundle = knn.build_centroid_buckets(
        settle["x"].to_numpy(), settle["y"].to_numpy(), settle["settlement_id"].tolist()
    )
    bc = spark.sparkContext.broadcast(bundle)
    got = {
        r.url: (r.settlement_id, r.dist)
        for r in knn.nearest_centroid(spark.createDataFrame(pts).repartition(5), bc).collect()
    }
    sx = settle["x"].to_numpy()
    sy = settle["y"].to_numpy()
    sid = settle["settlement_id"].tolist()
    for i in range(400):
        d = np.sqrt((sx - px[i]) ** 2 + (sy - py[i]) ** 2)
        j = int(np.argmin(d))
        g_id, g_d = got[f"p{i}"]
        assert g_id == sid[j], (i, g_id, sid[j])
        assert g_d == pytest.approx(float(d[j]), rel=1e-12)


def test_knn_isolated_point_forces_expansion(spark, settle):
    """A probe right next to the isolated settlement: its cell is empty
    of other centroids, nearest must still be S-ISO (ring expansion)."""
    pts = pd.DataFrame(
        {"url": ["probe"], "x": [geodata.BB_X0 + geodata.BB_W - 2500.0],
         "y": [geodata.BB_Y0 + geodata.BB_H - 2500.0]}
    )
    bundle = knn.build_centroid_buckets(
        settle["x"].to_numpy(), settle["y"].to_numpy(), settle["settlement_id"].tolist()
    )
    bc = spark.sparkContext.broadcast(bundle)
    rows = knn.nearest_centroid(spark.createDataFrame(pts), bc).collect()
    assert rows[0].settlement_id == "S-ISO"


@pytest.fixture(scope="module")
def tiles_cells(spark):
    tiles = geodata.raster_tiles()
    df = spark.createDataFrame(tiles)
    return tiles, zonal.tiles_to_cells(df, tile_w=16)


def _tiles_to_numpy(tiles: pd.DataFrame, layer: str) -> np.ndarray:
    """Oracle: reassemble the full raster grid for one layer."""
    sub = tiles[tiles.layer == layer]
    trmax = sub.tile_row.max() + 1
    tcmax = sub.tile_col.max() + 1
    full = np.full((trmax * 16, tcmax * 16), -1000.0)
    for r in sub.itertuples():
        block = np.array(r.tile).reshape(16, 16)
        full[r.tile_row * 16 : r.tile_row * 16 + 16, r.tile_col * 16 : r.tile_col * 16 + 16] = block
    return full


def test_tiles_to_cells_roundtrip(spark, tiles_cells):
    tiles, cells = tiles_cells
    got = cells.filter("layer = 'dem'").toPandas()
    full = _tiles_to_numpy(tiles, "dem")
    assert len(got) == full.size
    sample = got.sample(200, random_state=0)
    for r in sample.itertuples():
        assert full[r.y, r.x] == pytest.approx(r.value, rel=1e-6)


def test_avg_downsample_matches_numpy(spark, tiles_cells):
    tiles, cells = tiles_cells
    got = {
        (r.yb, r.xb): (r.avg_value, r.n_px)
        for r in zonal.avg_downsample(cells, 8).filter("layer='dem'").collect()
    }
    full = _tiles_to_numpy(tiles, "dem")
    H, W = full.shape
    for yb in range(H // 8):
        for xb in range(W // 8):
            block = full[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8]
            valid = block[block > -1000.0]
            if len(valid) == 0:
                assert (yb, xb) not in got
            else:
                assert got[(yb, xb)][0] == pytest.approx(valid.mean(), rel=1e-9)
                assert got[(yb, xb)][1] == len(valid)


def test_minmax_normalize_bounds(spark, tiles_cells):
    _, cells = tiles_cells
    out = zonal.minmax_normalize(cells).filter("value > -1000").agg(
        {"norm": "min"}
    ).collect()
    lo = out[0][0]
    hi = zonal.minmax_normalize(cells).agg({"norm": "max"}).collect()[0][0]
    assert lo == 0 and hi == 255


def test_overlap_stats(spark):
    # mixed-width ids: P12 burns AFTER P9 (rank order), although
    # lexicographically 'P12' < 'P9' — the rank column must decide
    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["a", "a", "b", "c", "c", "c"],
                "poly_id": ["P1", "P12", "P1", "P12", "P1", "P9"],
                "poly_rank": [1, 12, 1, 12, 1, 9],
            }
        )
    )
    got = {r.url: (r.cover_n, r.win_poly, r.on_border) for r in zonal.overlap_stats(pairs).collect()}
    # last-wins (MergeAlg.replace): the highest-ranked poly overwrites
    assert got == {"a": (2, "P12", True), "b": (1, "P1", False), "c": (3, "P12", True)}
    got_first = {
        r.url: r.win_poly
        for r in zonal.overlap_stats(pairs, wins="first").collect()
    }
    assert got_first == {"a": "P1", "b": "P1", "c": "P1"}
    with pytest.raises(ValueError, match="burn-order"):
        zonal.overlap_stats(pairs.drop("poly_rank")).collect()
    # a typo'd wins value must raise, not silently pick first-wins
    with pytest.raises(ValueError, match="wins"):
        zonal.overlap_stats(pairs, wins="lasts").collect()


def test_within_distance_join_exact_and_no_duplicates(spark):
    """Grid-hash ε-join: exact pair set vs brute force, and each pair
    emitted exactly ONCE even when points straddle cell borders."""
    import itertools

    from europe_gis_spark.operators import knn as K

    D = 10.0
    # points on and around bucket boundaries (cell size = D)
    lpts = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        [(0, 0), (10, 0), (9.999, 9.999), (20, 20), (15, 5), (-0.1, -0.1)]
    )]
    rpts = [(f"r{j}", float(x), float(y)) for j, (x, y) in enumerate(
        [(0, 0), (10, 10), (19, 21), (35, 35), (5, 5)]
    )]
    left = spark.createDataFrame(lpts, "event_id long, x double, y double")
    right = spark.createDataFrame(rpts, "anchor_id string, x double, y double")
    got = [
        (r.event_id, r.anchor_id)
        for r in K.within_distance_join(left, right, D).collect()
    ]
    want = [
        (i, a)
        for (i, lx, ly), (a, rx, ry) in itertools.product(lpts, rpts)
        if (lx - rx) ** 2 + (ly - ry) ** 2 <= D * D
    ]
    assert sorted(got) == sorted(want)
    assert len(got) == len(set(got))  # no bucket-overlap duplicates


def test_within_distance_join_fuzz_vs_brute_force(spark):
    """Random clouds at several distances: ε-join pair set == brute
    force, duplicate-free."""
    import itertools

    from europe_gis_spark.operators import knn as K

    rng = np.random.default_rng(23)
    for D in (3.0, 17.5, 60.0):
        lp = [(i, float(x), float(y)) for i, (x, y) in enumerate(rng.uniform(0, 100, (60, 2)))]
        rp = [(f"r{j}", float(x), float(y)) for j, (x, y) in enumerate(rng.uniform(0, 100, (25, 2)))]
        left = spark.createDataFrame(lp, "event_id long, x double, y double")
        right = spark.createDataFrame(rp, "anchor_id string, x double, y double")
        got = [(r.event_id, r.anchor_id) for r in K.within_distance_join(left, right, D).collect()]
        want = [
            (i, a)
            for (i, lx, ly), (a, rx, ry) in itertools.product(lp, rp)
            if (lx - rx) ** 2 + (ly - ry) ** 2 <= D * D
        ]
        assert sorted(got) == sorted(want), f"D={D}"
        assert len(got) == len(set(got))


def test_tile_pyramid_rollup_and_quadkey(spark):
    """Tile pyramid: every parent tile's counts/sums equal the sum of
    its (<=4) children, base-level counts match a brute-force grid,
    and each child's quadkey extends its parent's by one digit."""
    from europe_gis_spark.operators import webmap

    rng = np.random.default_rng(11)
    pts = [
        (float(x), float(y), float(v))
        for x, y, v in zip(
            rng.uniform(0, 1000, 300),
            rng.uniform(0, 1000, 300),
            rng.uniform(-5, 5, 300),
        )
    ]
    df = spark.createDataFrame(pts, "x double, y double, value double")
    out = webmap.tile_pyramid(df, 0.0, 0.0, 1024.0, 0, 4).collect()
    by_level = {}
    for r in out:
        by_level.setdefault(r.z, {})[(r.tx, r.ty)] = r
    # brute-force base grid
    base = {}
    for x, y, v in pts:
        k = (int(x // 64), int(y // 64))
        n, s = base.get(k, (0, 0))
        base[k] = (n + 1, s + int(np.floor(v * 1000)))
    assert {
        k: (r.n_events, r.mval_sum) for k, r in by_level[4].items()
    } == base
    for z in range(1, 5):
        for (tx, ty), r in by_level[z].items():
            parent = by_level[z - 1][(tx >> 1, ty >> 1)]
            assert r.quadkey[: z - 1] == parent.quadkey
        for (tx, ty), p in by_level[z - 1].items():
            kids = [
                c
                for (cx, cy), c in by_level[z].items()
                if (cx >> 1, cy >> 1) == (tx, ty)
            ]
            assert p.n_events == sum(c.n_events for c in kids)
            assert p.mval_sum == sum(c.mval_sum for c in kids)
    # zoom 0 is the whole world: one tile, empty quadkey, every point
    (root,) = by_level[0].values()
    assert root.n_events == 300 and root.quadkey == ""


def test_quadkey_negative_tile_ids_yield_binary_digits(spark):
    """r6 ADVICE fix: bit extraction must be (x >> i) & 1 — Spark's %
    keeps the dividend's sign, so out-of-world (negative) tile ids used
    to emit '-1' digits that broke the base-4 alphabet and diverged
    from the oracle's & 1 semantics."""
    from pyspark.sql import functions as F

    from europe_gis_spark.operators import webmap

    df = spark.createDataFrame(
        [(-1, -1), (-3, 2), (2, -3), (0, 0), (3, 3)], "tx long, ty long"
    )
    rows = df.select(
        "tx", "ty", webmap.quadkey_expr(F.col("tx"), F.col("ty"), 3).alias("qk")
    ).collect()
    for r in rows:
        assert len(r.qk) == 3 and set(r.qk) <= set("0123"), r
        # digit k must equal the oracle formula (ty>>i)&1 / (tx>>i)&1
        for d, i in zip(r.qk, range(2, -1, -1)):
            assert int(d) == ((r.ty >> i) & 1) * 2 + ((r.tx >> i) & 1), r


def test_kde_heatmap_mass_conservation(spark):
    """Total stamped density == n_points × Σ(stamp weights); the peak
    sits at a point's own cell; stamp is symmetric."""
    from europe_gis_spark.operators import webmap

    stamp = webmap.kde_kernel_weights(2, 1.0)
    assert {(dx, dy) for dx, dy, _ in stamp} == {
        (dx, dy) for dx in range(-2, 3) for dy in range(-2, 3)
    }
    wmap = {(dx, dy): w for dx, dy, w in stamp}
    assert wmap[(0, 0)] == 1_000_000 and wmap[(1, 0)] == wmap[(-1, 0)] == wmap[(0, 1)]
    pts = [(5.5, 5.5), (5.5, 5.5), (100.5, 100.5)]
    df = spark.createDataFrame(pts, "x double, y double")
    out = {(r.cx, r.cy): r.density_ppm for r in
           webmap.kde_heatmap(df, 0.0, 0.0, 1.0, 2, 1.0).collect()}
    assert sum(out.values()) == 3 * sum(wmap.values())
    assert out[(5, 5)] == 2_000_000 and out[(100, 100)] == 1_000_000
    assert out[(6, 5)] == 2 * wmap[(1, 0)]


def test_areal_interp_mass_conserved(spark):
    """Dasymetric redistribution: total interpolated mass equals the
    zone totals up to the per-cell integer-DIV floor loss; every cell
    receiving mass genuinely overlaps a zone."""
    from europe_gis_spark.queries import (
        AREAL_VALUES,
        BORDER_RECTS,
        q_areal_interp,
    )

    rows = q_areal_interp(spark, "/root/testdata/sf0.01").collect()
    assert rows
    total = sum(r.milli_value for r in rows)
    target = 1000 * sum(AREAL_VALUES.values())
    # each (cell, zone) share floors away < 1 milli-unit
    assert target - 2 * len(rows) <= total <= target
    for r in rows:
        g, xb, yb = r.grd_id.split("|")
        cx0, cy0 = int(xb) * 2000.0, int(yb) * 2000.0
        from europe_gis_spark.queries import AA_X0, AA_Y0

        hit = any(
            min(cx0 + 2000, x1 - AA_X0) > max(cx0, x0 - AA_X0)
            and min(cy0 + 2000, y1 - AA_Y0) > max(cy0, y0 - AA_Y0)
            for _, x0, y0, x1, y1 in BORDER_RECTS
        )
        assert hit, r.grd_id


def test_idw_surface_bounds_and_exactness_at_anchor(spark):
    """IDW values stay within the anchor-value envelope; a cell is
    dominated by its nearest anchor; Spark result equals a pure-python
    recompute of Shepard k=3."""
    from europe_gis_spark.queries import (
        AA_X0,
        AA_Y0,
        KNN_ANCHORS,
        q_idw_surface,
    )

    rows = q_idw_surface(spark, "/root/testdata/sf0.01").collect()
    assert rows
    vals = [10.0 * (i + 1) for i in range(len(KNN_ANCHORS))]
    anchors = [
        (x - AA_X0, y - AA_Y0, v)
        for (_, x, y), v in zip(KNN_ANCHORS, vals)
    ]
    for r in rows:
        assert min(vals) <= r.idw <= max(vals)
    import math

    for r in rows[:50]:
        cx, cy = r.xb * 2000.0 + 1000.0, r.yb * 2000.0 + 1000.0
        ds = sorted(
            ((cx - ax) ** 2 + (cy - ay) ** 2, v) for ax, ay, v in anchors
        )[:3]
        num = ds[0][1] / ds[0][0] + ds[1][1] / ds[1][0] + ds[2][1] / ds[2][0]
        den = 1.0 / ds[0][0] + 1.0 / ds[1][0] + 1.0 / ds[2][0]
        assert r.idw == round(num / den, 6), (r.xb, r.yb)


def test_rasterize_segments_dda_walk(spark):
    """Sampled-DDA line rasterization: the walk never skips a cell on
    the dominant axis, handles negative deltas (floor, not trunc),
    dedups within a segment, and counts overlapping segments twice."""
    from europe_gis_spark.operators import webmap

    segs = [
        (0.5, 0.5, 5.5, 2.5),    # rightward, slope < 1
        (5.5, 2.5, 0.5, 0.5),    # same line, reversed (negative deltas)
        (3.5, 3.5, 3.5, 3.5),    # degenerate: one cell
    ]
    df = spark.createDataFrame(segs, "ax double, ay double, bx double, by double")
    got = {(r.cx, r.cy): r.n_traversals for r in
           webmap.rasterize_segments(df, cell=1.0).collect()}
    # forward walk: n=5, t=0..5 -> x=0..5, y=floor((2t*2+5)/10)
    fwd = {(t, (2 * t * 2 + 5) // 10) for t in range(6)}
    for c in fwd:
        assert got.get(c, 0) >= 1, c
    assert got[(3, 3)] == 1
    # both long segments cover their shared endpoint cells
    assert got[(0, 0)] == 2 and got[(5, 2)] == 2
    # dominant-axis continuity: every x column 0..5 appears
    assert {x for x, _ in got} == {0, 1, 2, 3, 4, 5}


def test_hex_bin_nearest_center_and_mass(spark):
    """Every point lands in the hex whose center is nearest (the
    defining property of cube rounding); total mass preserved."""
    import math

    from europe_gis_spark.operators import webmap

    rng = np.random.default_rng(31)
    pts = [(float(x), float(y)) for x, y in rng.uniform(0, 100, (400, 2))]
    df = spark.createDataFrame(pts, "x double, y double")
    size = 7.0
    out = webmap.hex_bin(df, size=size).collect()
    assert sum(r.n_points for r in out) == 400

    def center(q, r):
        return (size * math.sqrt(3) * (q + r / 2.0), size * 1.5 * r)

    # recompute each point's bin in pure python and confirm nearest
    s3 = webmap.SQRT3 / 3.0
    for x, y in pts[:100]:
        fq = (s3 * x - y / 3.0) / size
        fr = (2.0 / 3.0 * y) / size
        fs = -fq - fr
        rq, rr, rs = (math.floor(v + 0.5) for v in (fq, fr, fs))
        dq, dr, ds = abs(rq - fq), abs(rr - fr), abs(rs - fs)
        if dq > dr and dq > ds:
            rq = -rr - rs
        elif dr > ds:
            rr = -rq - rs
        cx, cy = center(rq, rr)
        d0 = (x - cx) ** 2 + (y - cy) ** 2
        for nq, nr in ((1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)):
            nx, ny = center(rq + nq, rr + nr)
            assert d0 <= (x - nx) ** 2 + (y - ny) ** 2 + 1e-9
