"""Hypothesis property tests for the vendored geometry kernel — the
invariants that hold for ALL inputs, not just fixtures:

  * WKB encode/decode roundtrip is byte- and value-exact;
  * every point reported inside a polygon lies in a cover cell of that
    polygon (the cover can never drop a match — SURVEY.md §7.4 risk 5);
  * rect-clip area is bounded by both operand areas and is additive
    across a rect split;
  * projection roundtrip and equal-area hold on arbitrary domain points.
"""

import numpy as np
from hypothesis import assume, given, settings, strategies as st

from europe_gis_spark.geo import cells, geom, proj, wkb

# star-shaped simple polygon generator (concave allowed): increasing
# angles + positive radii around a center
@st.composite
def star_polygons(draw):
    n = draw(st.integers(min_value=3, max_value=10))
    # build angles from POSITIVE gaps (no filtering): always a proper
    # star-shaped, non-degenerate vertex ordering
    gaps = np.array(
        draw(st.lists(st.floats(0.2, 1.0, allow_nan=False), min_size=n, max_size=n))
    )
    angles = np.cumsum(gaps) / gaps.sum() * (2 * np.pi - 1e-6)
    radii = np.array(
        draw(
            st.lists(
                st.floats(500.0, 20_000.0, allow_nan=False), min_size=n, max_size=n
            )
        )
    )
    cx = draw(st.floats(1_000_000.0, 6_000_000.0, allow_nan=False))
    cy = draw(st.floats(1_000_000.0, 4_000_000.0, allow_nan=False))
    ring = np.stack(
        [cx + radii * np.cos(angles), cy + radii * np.sin(angles)], axis=1
    )
    ring = np.vstack([ring, ring[:1]])
    parts = [[ring]]
    # the kernel's contracts hold for VALID polygons (build_index drops
    # invalid ones, mirroring is_valid_geom)
    assume(geom.is_valid_polygon(parts))
    return parts


@settings(max_examples=40, deadline=None)
@given(parts=star_polygons())
def test_wkb_roundtrip_exact(parts):
    buf = wkb.encode_multipolygon(parts)
    back = wkb.polygon_parts(wkb.decode(buf))
    assert len(back) == len(parts)
    for rb, ra in zip(back, parts):
        np.testing.assert_array_equal(rb[0], ra[0])


@settings(max_examples=30, deadline=None)
@given(parts=star_polygons(), data=st.data())
def test_inside_points_always_in_cover(parts, data):
    res = 14
    cover = set(cells.cover_polygon(parts, res).tolist())
    xmin, ymin, xmax, ymax = geom.ring_bbox(parts[0][0])
    px = np.array(
        data.draw(
            st.lists(st.floats(xmin, xmax, allow_nan=False), min_size=20, max_size=20)
        )
    )
    py = np.array(
        data.draw(
            st.lists(st.floats(ymin, ymax, allow_nan=False), min_size=20, max_size=20)
        )
    )
    inside = geom.points_in_polygon(px, py, parts, boundary="include")
    cid = cells.cell_id(px, py, res)
    for i in np.nonzero(inside)[0]:
        assert int(cid[i]) in cover, "cover dropped a containing cell"


@settings(max_examples=30, deadline=None)
@given(parts=star_polygons())
def test_clip_area_bounds_and_additivity(parts):
    xmin, ymin, xmax, ymax = geom.ring_bbox(parts[0][0])
    # a rect overlapping the polygon's center region
    rx0 = xmin + (xmax - xmin) * 0.25
    rx1 = xmin + (xmax - xmin) * 0.75
    ry0 = ymin + (ymax - ymin) * 0.25
    ry1 = ymin + (ymax - ymin) * 0.75
    a = geom.clip_area_rect(parts, rx0, ry0, rx1, ry1)
    poly_area = geom.polygon_area(parts)
    rect_area = (rx1 - rx0) * (ry1 - ry0)
    assert -1e-6 <= a <= min(poly_area, rect_area) * (1 + 1e-9) + 1e-6
    # additivity across a vertical split of the rect
    rmid = (rx0 + rx1) / 2.0
    a_l = geom.clip_area_rect(parts, rx0, ry0, rmid, ry1)
    a_r = geom.clip_area_rect(parts, rmid, ry0, rx1, ry1)
    assert abs((a_l + a_r) - a) <= 1e-6 * max(a, 1.0)


@settings(max_examples=25, deadline=None)
@given(parts=star_polygons(), data=st.data())
def test_batch_clip_areas_equal_scalar(parts, data):
    """clip_areas_rects (the vectorized G5 weights kernel) must be
    BIT-identical to the scalar clip_area_rect on every rect — convex
    fast path and concave triangle-fan alike."""
    xmin, ymin, xmax, ymax = geom.ring_bbox(parts[0][0])
    n = 12
    rx0 = np.array(
        data.draw(st.lists(st.floats(xmin - 5000, xmax), min_size=n, max_size=n))
    )
    ry0 = np.array(
        data.draw(st.lists(st.floats(ymin - 5000, ymax), min_size=n, max_size=n))
    )
    w = np.array(
        data.draw(st.lists(st.floats(10.0, 30000.0), min_size=n, max_size=n))
    )
    batch = geom.clip_areas_rects(parts, rx0, ry0, rx0 + w, ry0 + w)
    scalar = np.array(
        [
            geom.clip_area_rect(parts, a, b, c, d)
            for a, b, c, d in zip(rx0, ry0, rx0 + w, ry0 + w)
        ]
    )
    assert (batch == scalar).all()


@settings(max_examples=50, deadline=None)
@given(
    lon=st.floats(-15.0, 35.0, allow_nan=False),
    lat=st.floats(30.0, 72.0, allow_nan=False),
)
def test_projection_roundtrip_everywhere(lon, lat):
    x, y = proj.forward(np.array([lon]), np.array([lat]))
    lon2, lat2 = proj.inverse(x, y)
    assert abs(lon2[0] - lon) < 1e-8
    assert abs(lat2[0] - lat) < 1e-7
