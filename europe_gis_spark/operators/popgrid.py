"""Population-grid pipeline: CSV attribute scan → union → attribute join
→ overlay (polygon×polygon intersection) → area-weighted zonal sums.

Reference path (``build_population_raster``):
  * two attribute CSVs with explicit dtypes + projection, concatenated
    (``/root/reference/src/data_engineering/raster_processor.py:240-254``)
    → S2 + U1;
  * left merge onto the polygon grid on ``GRD_ID``
    (``raster_processor.py:258``) → J1 broadcast hash join; the SQL
    update-join variant (``scripts/old_files/sql/gpopupdate.sql:1-9``)
    → J2 expressed as join + column overwrite;
  * ``gpd.overlay(…, how='intersection')`` + area-fraction reallocation
    (``scripts/jobs/process_raster_layer.py:398-432``) → J3/G5/G6: cell
    cover bucketing + exact rect×polygon clip areas (Sutherland–Hodgman)
    inside one pandas UDF, then a plain groupBy sum;
  * missing tiles NULL→0 fill on the left join
    (``scripts/old_files/sql/rasterize_gpop.sql:11-17``) → J5 coalesce.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo import cells as gcells
from ..geo import geom, wkb

ATTR_SCHEMA = T.StructType(
    [
        T.StructField("grd_id", T.StringType(), False),
        T.StructField("tot_p", T.IntegerType(), True),
    ]
)


def read_attr_csvs(spark: SparkSession, paths: list[str]) -> DataFrame:
    """S2 + U1: schema-pinned CSV scans unioned by name (never
    inferSchema — SURVEY.md §1.3)."""
    dfs = [
        spark.read.schema(ATTR_SCHEMA).option("header", "true").csv(p).select(
            "grd_id", "tot_p"
        )
        for p in paths
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def attribute_join(grid: DataFrame, attrs: DataFrame) -> DataFrame:
    """J1/J2/J5: broadcast-left attribute join with NULL→0 fill —
    equivalently the UPDATE…FROM of gpopupdate.sql."""
    return grid.join(F.broadcast(attrs), "grd_id", "left").withColumn(
        "tot_p", F.coalesce(F.col("tot_p"), F.lit(0))
    )


def overlay_weights(
    grid: DataFrame,
    polygons: list[tuple[str, bytes]],
    res: int = gcells.RES_DEFAULT,
) -> DataFrame:
    """J3/G6: polygon×grid-square intersection areas.

    The (small) zone-polygon list is decoded once per Python worker from
    the task closure; grid squares stream through in Arrow batches. Per
    (polygon, batch): a vectorized bbox prefilter picks candidate cells,
    then ONE ``geom.clip_areas_rects`` call computes every exact clip
    area — no per-cell Python loop anywhere (the former per-cell
    cover_polygon + clip loop was the kernel's bottleneck at cell
    counts ≫ polygon counts, the 100 TB-side regime).
    Output: (grd_id, zone_id, area_frac) with area_frac = |cell ∩ zone|
    / |cell| — the areal-interpolation weight of
    process_raster_layer.py:402-403.
    """
    decoded = []
    for pid, buf in polygons:
        parts = wkb.polygon_parts(wkb.decode(buf))
        if geom.is_valid_polygon(parts):
            bbs = np.array([geom.ring_bbox(rings[0]) for rings in parts])
            bbox = (
                bbs[:, 0].min(),
                bbs[:, 1].min(),
                bbs[:, 2].max(),
                bbs[:, 3].max(),
            )
            decoded.append((pid, parts, bbox))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        empty = pd.DataFrame(
            {
                "grd_id": pd.Series(dtype=object),
                "zone_id": pd.Series(dtype=object),
                "area_frac": pd.Series(dtype=np.float64),
            }
        )
        for b in batches:
            x0 = b["x0"].to_numpy(dtype=np.float64)
            y0 = b["y0"].to_numpy(dtype=np.float64)
            size = b["size"].to_numpy(dtype=np.float64)
            grd = np.asarray(b["grd_id"], dtype=object)
            frames = []
            for pid, parts, (px0, py0, px1, py1) in decoded:
                cand = (
                    (x0 < px1)
                    & (x0 + size > px0)
                    & (y0 < py1)
                    & (y0 + size > py0)
                )
                if not cand.any():
                    continue
                cx0, cy0, cs = x0[cand], y0[cand], size[cand]
                a = geom.clip_areas_rects(parts, cx0, cy0, cx0 + cs, cy0 + cs)
                pos = a > 0
                if pos.any():
                    frames.append(
                        pd.DataFrame(
                            {
                                "grd_id": grd[cand][pos],
                                "zone_id": pid,
                                "area_frac": a[pos] / (cs[pos] * cs[pos]),
                            }
                        )
                    )
            yield pd.concat(frames, ignore_index=True) if frames else empty

    src = grid.select(
        "grd_id", "x0", "y0", F.lit(1000.0).alias("size")
        if "size" not in grid.columns
        else F.col("size"),
    )
    return src.mapInPandas(fn, schema="grd_id string, zone_id string, area_frac double")


def overlay_intersection(
    grid: DataFrame,
    polygons: list[tuple[str, bytes]],
    res: int = gcells.RES_DEFAULT,
) -> DataFrame:
    """J3 with GEOMETRY output — the full ``gpd.overlay(grid, zones,
    how='intersection')`` shape (``process_raster_layer.py:398-403``):
    one row per intersecting (grid square, zone) pair carrying the
    intersection polygon as WKB plus its exact area. Same cell-cover
    candidate pruning and Arrow batching as :func:`overlay_weights`;
    the clip itself is Sutherland–Hodgman against the (convex) square.
    """
    decoded = []
    for pid, buf in polygons:
        parts = wkb.polygon_parts(wkb.decode(buf))
        if geom.is_valid_polygon(parts):
            bbs = np.array([geom.ring_bbox(rings[0]) for rings in parts])
            bbox = (
                bbs[:, 0].min(),
                bbs[:, 1].min(),
                bbs[:, 2].max(),
                bbs[:, 3].max(),
            )
            decoded.append((pid, parts, bbox))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"grd_id": [], "zone_id": [], "geometry": [], "area": []}
            x0 = b["x0"].to_numpy(dtype=np.float64)
            y0 = b["y0"].to_numpy(dtype=np.float64)
            size = b["size"].to_numpy(dtype=np.float64)
            grd = b["grd_id"].tolist()
            # vectorized bbox prefilter per polygon (the per-cell
            # cover_polygon of the old loop cost more than the clips);
            # geometry assembly stays per-pair (ragged WKB output) but
            # only runs on bbox-surviving pairs
            for pid, parts, (px0, py0, px1, py1) in decoded:
                cand = np.nonzero(
                    (x0 < px1)
                    & (x0 + size > px0)
                    & (y0 < py1)
                    & (y0 + size > py0)
                )[0]
                for i in cand:
                    cx0, cy0, s = x0[i], y0[i], size[i]
                    clipped = geom.clip_polygon_rect(
                        parts, cx0, cy0, cx0 + s, cy0 + s
                    )
                    if not clipped:
                        continue
                    area = geom.polygon_area(clipped)
                    if area <= 0:
                        continue
                    out["grd_id"].append(grd[i])
                    out["zone_id"].append(pid)
                    out["geometry"].append(wkb.encode_multipolygon(clipped))
                    out["area"].append(area)
            yield pd.DataFrame(out)

    src = grid.select(
        "grd_id", "x0", "y0", F.lit(1000.0).alias("size")
        if "size" not in grid.columns
        else F.col("size"),
    )
    return src.mapInPandas(
        fn, schema="grd_id string, zone_id string, geometry binary, area double"
    )


def zonal_population(
    grid_attrs: DataFrame, weights: DataFrame
) -> DataFrame:
    """G5: Σ tot_p · area_frac per zone (area-weighted reallocation,
    process_raster_layer.py:420-432)."""
    return (
        grid_attrs.select("grd_id", "tot_p")
        .join(weights, "grd_id")
        .groupBy("zone_id")
        .agg(
            F.round(F.sum(F.col("tot_p") * F.col("area_frac")), 6).alias("pop_sum"),
            F.count("*").alias("n_cells"),
        )
    )
