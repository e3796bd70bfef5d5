"""Hierarchical planar grid cells — the engine's H3/S2 stand-in.

The reference tiles rasters 1000×1000 px as its unit of storage,
parallelism and indexing (``raster2pgsql -t 1000x1000 -s 3035``,
``/root/reference/scripts/old_files/echo/dem.bat:1``, GiST index ``-I``).
The engine generalizes that into a power-of-two hierarchy over the planar
CRS: at resolution ``r`` a cell is a square of side ``BASE_SIZE / 2**r``
meters, identified by a single int64. No h3/s2 library exists in this
container; this pure-numpy grid gives the same operational properties:

  * int64 ids → plain equi-join keys / partition keys (bucketed spatial
    join, SURVEY.md §2.3 J3/J6),
  * parent/child in O(1) → adaptive cell splitting for hot cells,
  * ``grid_disk(cell, k)`` rings → kNN ring expansion (J9),
  * deterministic, byte-stable everywhere.

id layout (int64): [res:6 bits][iy:29 bits][ix:29 bits], all non-negative
for coordinates in [0, 2**29 * min_cell) — covers the EPSG:3035 domain
(x,y ∈ ~[0.9e6, 7.4e6] m) with room to spare.
"""

from __future__ import annotations

import numpy as np

from . import geom, wkb

BASE_SIZE = float(1 << 23)  # 8 388 608 m at res 0 — one cell spans Europe
MAX_RES = 23  # finest cell = 1 m

# convenient named resolutions (≈ H3 res 7 / 8 / 9 cell edge)
RES_COARSE = 12  # 2048 m
RES_DEFAULT = 13  # 1024 m  (the reference's 1000 m working resolution)
RES_FINE = 14  # 512 m

_IX_BITS = 29
_IX_MASK = (1 << _IX_BITS) - 1


def cell_size(res: int) -> float:
    return BASE_SIZE / (1 << res)


def cell_id(x, y, res: int):
    """Vectorized point → cell id. Accepts scalars or numpy arrays."""
    size = cell_size(res)
    ix = np.floor(np.asarray(x, dtype=np.float64) / size).astype(np.int64)
    iy = np.floor(np.asarray(y, dtype=np.float64) / size).astype(np.int64)
    return (np.int64(res) << np.int64(58)) | (iy << np.int64(_IX_BITS)) | ix


def cell_res(cid) -> np.ndarray:
    return (np.asarray(cid, dtype=np.int64) >> np.int64(58)).astype(np.int32)


def cell_xy(cid):
    """Cell id → (ix, iy, res)."""
    cid = np.asarray(cid, dtype=np.int64)
    res = cid >> np.int64(58)
    ix = cid & np.int64(_IX_MASK)
    iy = (cid >> np.int64(_IX_BITS)) & np.int64(_IX_MASK)
    return ix, iy, res


def cell_bounds(cid) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    ix, iy, res = cell_xy(cid)
    size = BASE_SIZE / (np.int64(1) << res).astype(np.float64)
    xmin = ix.astype(np.float64) * size
    ymin = iy.astype(np.float64) * size
    return xmin, ymin, xmin + size, ymin + size


def cell_center(cid) -> tuple[np.ndarray, np.ndarray]:
    xmin, ymin, xmax, ymax = cell_bounds(cid)
    return (xmin + xmax) * 0.5, (ymin + ymax) * 0.5


def parent(cid, res: int):
    """Ancestor cell at a coarser resolution (O(1) bit shifts)."""
    ix, iy, r = cell_xy(cid)
    shift = (r - np.int64(res)).astype(np.int64)
    return (
        (np.int64(res) << np.int64(58))
        | ((iy >> shift) << np.int64(_IX_BITS))
        | (ix >> shift)
    )


def children(cid: int) -> np.ndarray:
    """The four direct children of one cell."""
    ix, iy, res = cell_xy(np.int64(cid))
    r2 = int(res) + 1
    out = []
    for dy in (0, 1):
        for dx in (0, 1):
            out.append(
                (np.int64(r2) << np.int64(58))
                | ((iy * 2 + dy) << np.int64(_IX_BITS))
                | (ix * 2 + dx)
            )
    return np.array(out, dtype=np.int64)


def grid_disk(cid: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k (the (2k+1)² block) — the
    ring-expansion primitive for kNN (SURVEY.md §2.3 J9)."""
    ix, iy, res = cell_xy(np.int64(cid))
    dx, dy = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    nx = (ix + dx.ravel()).astype(np.int64)
    ny = (iy + dy.ravel()).astype(np.int64)
    keep = (nx >= 0) & (ny >= 0) & (nx <= _IX_MASK) & (ny <= _IX_MASK)
    return (res << np.int64(58)) | (ny[keep] << np.int64(_IX_BITS)) | nx[keep]


def grid_ring(cid: int, k: int) -> np.ndarray:
    """Only the cells at exactly Chebyshev distance k."""
    if k == 0:
        return np.array([np.int64(cid)], dtype=np.int64)
    disk = grid_disk(cid, k)
    inner = set(grid_disk(cid, k - 1).tolist())
    return np.array([c for c in disk.tolist() if c not in inner], dtype=np.int64)


def cover_polygon(
    parts: list[list[np.ndarray]], res: int, max_cells: int = 250_000
) -> np.ndarray:
    """Exact conservative cell cover of a (multi)polygon at resolution
    ``res``: every cell whose square intersects the polygon (boundary
    included). Unlike H3 polyfill's center rule this can never drop a
    covering cell (SURVEY.md §7.4 risk 5).
    """
    size = cell_size(res)
    out: list[int] = []
    for rings in parts:
        xmin, ymin, xmax, ymax = geom.ring_bbox(rings[0])
        # widen by one cell so boundary-touching neighbors are kept —
        # exact "closed cell rect intersects polygon" semantics, matching
        # ST_Intersects tile selection (rasterize_gpop.sql:7-8)
        ix0 = max(int(np.floor(xmin / size)) - 1, 0)
        ix1 = int(np.floor(xmax / size)) + 1
        iy0 = max(int(np.floor(ymin / size)) - 1, 0)
        iy1 = int(np.floor(ymax / size)) + 1
        if (ix1 - ix0 + 1) * (iy1 - iy0 + 1) > max_cells:
            raise ValueError(
                f"cover at res {res} would exceed {max_cells} cells; "
                "use a coarser res for this polygon"
            )
        one = [rings]
        for iy in range(iy0, iy1 + 1):
            cy0, cy1 = iy * size, (iy + 1) * size
            for ix in range(ix0, ix1 + 1):
                cx0, cx1 = ix * size, (ix + 1) * size
                if geom.rect_intersects_polygon(cx0, cy0, cx1, cy1, one):
                    out.append(
                        (res << 58) | (iy << _IX_BITS) | ix
                    )
    return np.unique(np.array(out, dtype=np.int64))


def cover_geom_wkb(wkb_bytes: bytes, res: int) -> np.ndarray:
    return cover_polygon(wkb.polygon_parts(wkb.decode(wkb_bytes)), res)


def adaptive_cover(
    parts: list[list[np.ndarray]],
    res_coarse: int,
    res_fine: int,
    budget: int = 4096,
) -> np.ndarray:
    """Multi-resolution cover: start coarse, split cells while staying
    under ``budget`` total cells. Mirrors the adaptive cell-splitting
    strategy for hot cells (SURVEY.md §4 custom item 2) applied at index
    build time. Returned ids carry mixed resolutions; lookups must probe
    each res present (the index records which)."""
    cur = cover_polygon(parts, res_coarse)
    res = res_coarse
    while res < res_fine and len(cur) * 4 <= budget:
        res += 1
        cur = cover_polygon(parts, res)
    return cur
