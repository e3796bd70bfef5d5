"""End-to-end spatial join on Spark vs brute-force numpy oracle.

SURVEY.md §5.2: shapely-free brute force over the cross product validates
the cell-bucketed join exactly; §5.3 property: result independent of
partitioning."""

import numpy as np
import pandas as pd
import pytest

from europe_gis_spark.datagen import geodata, pages as pgen
from europe_gis_spark.extract import html as hx
from europe_gis_spark.geo import geom, proj, wkb
from europe_gis_spark.operators import geo_join

N_PAGES = 1500
SEED = 42


@pytest.fixture(scope="module")
def fixture_pages():
    return pgen.pages_pandas(np.arange(N_PAGES), seed=SEED)


@pytest.fixture(scope="module")
def level3():
    ap = geodata.admin_polygons()
    return ap[ap.levl_code == 3].reset_index(drop=True)


def brute_force_assign(pages_pdf: pd.DataFrame, polys: pd.DataFrame) -> dict:
    """Oracle: decode every polygon, test every resolvable page point,
    LAST (table-order) valid polygon wins — rasterio MergeAlg.replace
    burn order, the same rule as the engine's default match='last'."""
    hints = {r.host: (r.lat, r.lon) for r in pgen.host_city_hints().itertuples()}
    out = {}
    decoded = []
    for r in polys.itertuples():
        parts = wkb.polygon_parts(wkb.decode(r.geometry))
        if geom.is_valid_polygon(parts):
            decoded.append((r.nuts_id, parts))
    for row in pages_pdf.itertuples():
        got = hx.extract_coords(row.html, row.text)
        if got is None:
            host = hx.extract_host(row.url)
            got = hints.get(host)
        if got is None:
            out[row.url] = None
            continue
        lat, lon = got
        x, y = proj.forward(np.array([lon]), np.array([lat]))
        hit = None
        for pid, parts in decoded:  # later burns overwrite earlier ones
            if geom.points_in_polygon(x, y, parts, boundary="include")[0]:
                hit = pid
        out[row.url] = hit
    return out


def test_spatial_join_matches_bruteforce(spark, fixture_pages, level3):
    pages_df = spark.createDataFrame(fixture_pages)
    polys_df = spark.createDataFrame(level3)
    hints = pgen.host_city_hints()

    idx_bc = geo_join.build_polygon_index_bc(spark, polys_df)
    resolved = geo_join.resolve_pages(spark, pages_df, host_hints=hints)
    assigned = geo_join.assign_polygons(resolved, idx_bc).collect()
    got = {r.url: r.poly_id for r in assigned}

    want = brute_force_assign(fixture_pages, level3)
    assert len(got) == N_PAGES
    mismatches = {u: (got[u], want[u]) for u in want if got[u] != want[u]}
    assert not mismatches, f"{len(mismatches)} mismatches, e.g. {list(mismatches.items())[:5]}"
    # sanity on the mix: some matched, some null (outside / unresolvable)
    n_hit = sum(1 for v in want.values() if v)
    assert n_hit > N_PAGES * 0.5
    assert sum(1 for v in want.values() if v is None) > N_PAGES * 0.2


def test_join_partitioning_invariance(spark, fixture_pages, level3):
    polys_df = spark.createDataFrame(level3)
    hints = pgen.host_city_hints()
    idx_bc = geo_join.build_polygon_index_bc(spark, polys_df)

    def run(nparts):
        pages_df = spark.createDataFrame(fixture_pages).repartition(nparts)
        resolved = geo_join.resolve_pages(spark, pages_df, host_hints=hints)
        rows = geo_join.assign_polygons(resolved, idx_bc).collect()
        return sorted((r.url, r.poly_id) for r in rows)

    assert run(2) == run(13)


def test_pages_per_region_counts(spark, fixture_pages, level3):
    pages_df = spark.createDataFrame(fixture_pages)
    polys_df = spark.createDataFrame(geodata.admin_polygons())
    counts = geo_join.pages_per_region(
        spark, pages_df, polys_df, host_hints=pgen.host_city_hints(), level=3
    ).collect()
    got = {r.nuts_id: r.n_pages for r in counts}
    want_assign = brute_force_assign(fixture_pages, level3)
    want = {}
    for v in want_assign.values():
        want[v] = want.get(v, 0) + 1
    assert got == want


def test_multi_match_overlap_counting(spark, level3):
    """match='all' emits one row per covering polygon — the G3
    border/overlap semantics: exact planar points on shared borders must
    hit ≥2 polygons (all_touched=True burn twice, raster_processor.py:
    154-188; consumed as border detect at dataset_creation.py:243-247)."""
    polys_df = spark.createDataFrame(level3)
    idx_bc = geo_join.build_polygon_index_bc(spark, polys_df)
    pts = pd.DataFrame(
        {
            "url": ["border-v", "corner-4", "interior"],
            "x": [
                geodata.AA_X0 + 10_000.0,  # level-3 vertical border
                geodata.AA_X0 + 20_000.0,  # 4-square corner
                geodata.AA_X0 + 5_000.0,
            ],
            "y": [
                geodata.AA_Y0 + 15_000.0,
                geodata.AA_Y0 + 20_000.0,
                geodata.AA_Y0 + 15_000.0,
            ],
            "cell": [0, 0, 0],
        }
    )
    resolved = spark.createDataFrame(pts)
    multi = geo_join.assign_polygons(resolved, idx_bc, match="all")
    counts = {
        r.url: r["count"]
        for r in multi.where("poly_id is not null").groupBy("url").count().collect()
    }
    assert counts["border-v"] == 2
    assert counts["corner-4"] == 4
    assert counts["interior"] == 1


def test_jvm_extract_path_equals_python_path(spark, fixture_pages, level3):
    """The JVM-regex coordinate prefilter (tag_pages jvm_extract=True,
    the default — html never crosses Arrow) must be row-for-row equal
    to the all-Python extraction path on the full fixture set, which
    includes non-UTF8 bytes, empty html, boundary points and
    hint-fallback hosts — for both the plain and the fused-metrics
    variant."""
    pages = spark.createDataFrame(fixture_pages)
    idx = geo_join.build_polygon_index_bc(spark, spark.createDataFrame(level3))
    hints = pgen.host_city_hints()
    for metrics in (False, True):
        a = (
            geo_join.tag_pages(
                pages, idx, host_hints=hints, with_metrics=metrics,
                jvm_extract=True,
            )
            .toPandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        b = (
            geo_join.tag_pages(
                pages, idx, host_hints=hints, with_metrics=metrics,
                jvm_extract=False,
            )
            .toPandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


def test_shuffle_pip_equals_broadcast_pip(spark, fixture_pages, level3):
    """pip_join_shuffle (no-broadcast cell-bucketed hash join + salted
    cogroup refine) must assign every resolvable page to exactly the
    same polygon as the broadcast-index path — same burn order, same
    boundary rule — across the full fixture set (hot city cell, border
    points, multi-polygon regions)."""
    pages = spark.createDataFrame(fixture_pages)
    resolved = geo_join.resolve_pages(
        spark, pages, host_hints=pgen.host_city_hints()
    ).filter("x IS NOT NULL")
    pts = resolved.select("url", "x", "y")
    polys_pdf = level3.copy()
    polys_pdf["burn"] = range(len(polys_pdf))
    polys_df = spark.createDataFrame(polys_pdf)
    got = {
        r.url: r.poly_id
        for r in geo_join.pip_join_shuffle(
            pts, polys_df, keep_cols=("url",)
        ).collect()
    }
    idx = geo_join.build_polygon_index_bc(spark, spark.createDataFrame(level3))
    want = {
        r.url: r.poly_id
        for r in geo_join.assign_polygons(
            resolved, idx, keep_cols=("url",)
        ).collect()
    }
    assert got == want
    assert any(v is not None for v in want.values())


def test_streaming_geo_tag_equals_batch(spark, fixture_pages, level3, tmp_path):
    """The flagship geo-tag runs unchanged inside Structured Streaming
    (mapInPandas is streaming-capable; the broadcast index rides the
    closure): incremental_ingest with tag_pages as the transform must
    produce EXACTLY the batch assignments, and a second invocation must
    be a no-op (exactly-once over already-seen files)."""
    from europe_gis_spark.streaming import incremental

    src, dst, ck = str(tmp_path / "src"), str(tmp_path / "dst"), str(tmp_path / "ck")
    pages = spark.createDataFrame(fixture_pages)
    pages.write.parquet(src)
    idx = geo_join.build_polygon_index_bc(spark, spark.createDataFrame(level3))
    hints = pgen.host_city_hints()

    incremental.incremental_ingest(
        spark,
        src,
        dst,
        ck,
        schema=pages.schema,
        transform=lambda s: geo_join.tag_pages(s, idx, host_hints=hints),
    )
    got = {r.url: r.poly_id for r in spark.read.parquet(dst).collect()}
    want = {
        r.url: r.poly_id
        for r in geo_join.tag_pages(pages, idx, host_hints=hints).collect()
    }
    assert got == want
    # drain again with no new files: nothing appended
    incremental.incremental_ingest(
        spark, src, dst, ck,
        schema=pages.schema,
        transform=lambda s: geo_join.tag_pages(s, idx, host_hints=hints),
    )
    assert spark.read.parquet(dst).count() == len(want)
