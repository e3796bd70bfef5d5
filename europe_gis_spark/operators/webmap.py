"""Web-map tile serving: slippy-style power-of-two tile pyramids.

The serving layer every web GIS ends with (ref: the reference's raster
tiling feeds map overlays — raster_processor.py tile loops): aggregate
points into the max-zoom tile grid ONCE, then roll each coarser zoom up
from its children 4-to-1.  The naive per-zoom shape re-shuffles the
point corpus once per zoom level; this one shuffles it once, and every
further level is an aggregation over an already-aggregated tile table
4x smaller than the last — at 100 TB the pyramid above the base level
is effectively free, and each level's agg is a fresh (tx, ty) hash key
so no level inherits the skew of a hot parent tile.

Tile ids follow the slippy-map convention over a planar power-of-two
world square: at zoom z the world splits into 2^z x 2^z tiles,
tx = floor((x - x0) / (world / 2^z)), and a tile's QUADKEY is the
z-digit base-4 string whose i-th digit interleaves bit (z-1-i) of ty
(high) and tx (low) — parent = prefix, the property tile caches key on.

Values are summed as exact integer milli-units (floor(value * 1000)) so
pyramid sums are associative and engine-portable — float sums would
depend on partial-aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def quadkey_expr(tx, ty, z: int):
    """Base-4 quadkey string for a zoom-``z`` tile id pair (JVM-only:
    shifts, masks and a concat — no UDF).

    Bit extraction is ``shiftright(...) & 1`` — NOT ``% 2``: Spark's %
    keeps the dividend's sign, so a NEGATIVE tile id (a point left/below
    the tiling origin) would yield digit −1 while the DuckDB oracle's
    ``(ty >> i) & 1`` yields 0/1 (r5 ADVICE item; latent — in-world
    fixtures never hit it, and &1 ≡ %2 for non-negative ids, so
    in-world quadkeys are unchanged)."""
    digits = [
        (
            F.shiftright(ty, i).bitwiseAND(F.lit(1)) * 2
            + F.shiftright(tx, i).bitwiseAND(F.lit(1))
        ).cast("string")
        for i in range(z - 1, -1, -1)
    ]
    return F.concat(*digits) if digits else F.lit("")


SQRT3 = 1.7320508075688772


def hex_bin(
    points: DataFrame,
    size: float,
    x0: float = 0.0,
    y0: float = 0.0,
) -> DataFrame:
    """Pointy-top hexagonal binning (the H3-shaped aggregation every
    density map offers beside square tiles): axial (q, r) cell per
    point via fractional axial coords + cube rounding, ONE (q, r)
    shuffle for the counts.

    Engine-portability: every step is a fixed float expression —
    literal √3, `floor(x + 0.5)` instead of round() (half-even vs
    half-away divergence), and the cube-round repair branch picks the
    largest residual with plain comparisons — so DuckDB evaluates the
    bit-identical IEEE sequence and the bin ids match exactly."""
    px = F.col("x") - x0
    py = F.col("y") - y0
    fq = (F.lit(SQRT3 / 3.0) * px - F.lit(1.0 / 3.0) * py) / size
    fr = (F.lit(2.0 / 3.0) * py) / size

    def rnd(c):
        return F.floor(c + F.lit(0.5))

    binned = points.select(
        fq.alias("fq"), fr.alias("fr"), (-fq - fr).alias("fs")
    ).select(
        "fq",
        "fr",
        "fs",
        rnd(F.col("fq")).alias("rq"),
        rnd(F.col("fr")).alias("rr"),
        rnd(F.col("fs")).alias("rs"),
    )
    dq = F.abs(F.col("rq") - F.col("fq"))
    dr = F.abs(F.col("rr") - F.col("fr"))
    ds = F.abs(F.col("rs") - F.col("fs"))
    q = F.when(
        (dq > dr) & (dq > ds), -F.col("rr") - F.col("rs")
    ).otherwise(F.col("rq"))
    r = F.when(
        (~((dq > dr) & (dq > ds))) & (dr > ds), -F.col("rq") - F.col("rs")
    ).otherwise(F.col("rr"))
    return (
        binned.select(q.cast("long").alias("hq"), r.cast("long").alias("hr"))
        .groupBy("hq", "hr")
        .agg(F.count("*").alias("n_points"))
    )


def rasterize_segments(
    segments: DataFrame,
    cell: float,
    x0: float = 0.0,
    y0: float = 0.0,
) -> DataFrame:
    """Flow-map line rasterization: each segment (ax, ay, bx, by)
    marks every grid cell a sampled DDA walk touches; output is
    per-cell traversal counts (the desire-line density raster).

    The walk takes n = max(|Δcx|, |Δcy|) + 1 samples (cell-level
    deltas), so consecutive samples never skip a cell along the
    dominant axis; sample t lands in cell c0 + floor((2tΔ + n) /
    2n) per axis — integer inputs, one exact IEEE division, floor —
    bit-identical across engines (integer `DIV` would differ on
    negative deltas: trunc vs floor). Cells are deduplicated within a
    segment (diagonal walks revisit), then ONE (cx, cy) aggregation.
    Map-side explode bounded by the longest segment in cells — the
    constant to watch at scale (split ultra-long segments upstream)."""
    bax = F.floor((F.col("ax") - x0) / cell).cast("long")
    bay = F.floor((F.col("ay") - y0) / cell).cast("long")
    bbx = F.floor((F.col("bx") - x0) / cell).cast("long")
    bby = F.floor((F.col("by") - y0) / cell).cast("long")
    base = segments.select(
        F.monotonically_increasing_id().alias("seg"),
        bax.alias("cax"),
        bay.alias("cay"),
        (bbx - bax).alias("dx"),
        (bby - bay).alias("dy"),
    ).withColumn(
        "n", F.greatest(F.abs("dx"), F.abs("dy"))
    )
    stepped = base.select(
        "seg",
        "cax",
        "cay",
        "dx",
        "dy",
        "n",
        F.explode(F.sequence(F.lit(0), F.col("n"))).alias("t"),
    )
    cx = F.col("cax") + F.floor(
        (2 * F.col("t") * F.col("dx") + F.col("n"))
        / (2.0 * F.greatest(F.col("n"), F.lit(1)))
    ).cast("long")
    cy = F.col("cay") + F.floor(
        (2 * F.col("t") * F.col("dy") + F.col("n"))
        / (2.0 * F.greatest(F.col("n"), F.lit(1)))
    ).cast("long")
    return (
        stepped.select("seg", cx.alias("cx"), cy.alias("cy"))
        .distinct()
        .groupBy("cx", "cy")
        .agg(F.count("*").alias("n_traversals"))
    )


def kde_kernel_weights(radius_cells: int, sigma_cells: float) -> list:
    """The quantized Gaussian stamp: (dx, dy, floor(1e6·exp(-(dx²+dy²)
    / 2σ²))) for every offset within the Chebyshev radius.  Weights
    are integer parts-per-million computed DRIVER-SIDE, so the engines
    only ever add exact integers — no transcendental evaluated in
    either engine, no float-sum ordering anywhere."""
    import math

    out = []
    for dx in range(-radius_cells, radius_cells + 1):
        for dy in range(-radius_cells, radius_cells + 1):
            w = int(
                math.floor(
                    1e6
                    * math.exp(-(dx * dx + dy * dy) / (2.0 * sigma_cells**2))
                )
            )
            if w > 0:
                out.append((dx, dy, w))
    return out


def kde_heatmap(
    points: DataFrame,
    x0: float,
    y0: float,
    cell: float,
    radius_cells: int = 2,
    sigma_cells: float = 1.0,
) -> DataFrame:
    """Binned kernel-density heatmap (the standard web-map density
    layer): each point stamps a quantized Gaussian onto the
    (2r+1)² cells around its bin; cell densities are exact integer
    ppm sums.  Map-side constant-factor explode (the stamp is a plan
    literal riding ``F.inline``) then ONE (cx, cy) shuffle — the same
    single-exchange profile as a plain grid count, just (2r+1)²×
    heavier on the map side.  Kernel truncation at ``radius_cells``
    is what bounds the explode; at 100 TB the stamp size is the ONLY
    constant to tune."""
    stamp = kde_kernel_weights(radius_cells, sigma_cells)
    offsets = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
                F.lit(w).cast("long").alias("w"),
            )
            for dx, dy, w in stamp
        ]
    )
    return (
        points.select(
            F.floor((F.col("x") - x0) / cell).cast("long").alias("bx"),
            F.floor((F.col("y") - y0) / cell).cast("long").alias("by"),
        )
        .select("bx", "by", F.inline(offsets))
        .groupBy(
            (F.col("bx") + F.col("dx")).alias("cx"),
            (F.col("by") + F.col("dy")).alias("cy"),
        )
        .agg(F.sum("w").alias("density_ppm"))
    )


def tile_pyramid(
    points: DataFrame,
    x0: float,
    y0: float,
    world_size: float,
    z_min: int,
    z_max: int,
    value_col: str = "value",
) -> DataFrame:
    """(z, tx, ty, quadkey, n_events, mval_sum) for every occupied tile
    at zooms z_min..z_max.  ONE corpus shuffle (the z_max grid agg);
    each coarser level aggregates the previous level's tile table with
    tx >> 1, ty >> 1 — 4x smaller per step, all in one declarative
    plan."""
    if not (0 <= z_min <= z_max):
        raise ValueError("need 0 <= z_min <= z_max")
    size = world_size / (1 << z_max)
    base = (
        points.select(
            F.floor((F.col("x") - x0) / size).cast("long").alias("tx"),
            F.floor((F.col("y") - y0) / size).cast("long").alias("ty"),
            F.floor(F.col(value_col) * 1000).cast("long").alias("mval"),
        )
        .groupBy("tx", "ty")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("mval").alias("mval_sum"),
        )
    )
    levels = {z_max: base}
    for z in range(z_max - 1, z_min - 1, -1):
        levels[z] = (
            levels[z + 1]
            .groupBy(
                F.shiftright("tx", 1).alias("tx"),
                F.shiftright("ty", 1).alias("ty"),
            )
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("mval_sum").alias("mval_sum"),
            )
        )
    out = None
    for z in range(z_min, z_max + 1):
        lvl = levels[z].select(
            F.lit(z).alias("z"),
            "tx",
            "ty",
            quadkey_expr(F.col("tx"), F.col("ty"), z).alias("quadkey"),
            "n_events",
            "mval_sum",
        )
        out = lvl if out is None else out.unionByName(lvl)
    return out
