"""Pure-numpy geometry kernel (no GDAL/shapely/h3 — all vendored).

The reference leans on GEOS/GDAL for geometry predicates
(``/root/reference/src/data_engineering/raster_processor.py:154-188``);
this container has none of those libraries, so the engine vendors a small,
deterministic, vectorized kernel: WKB codec, ray-cast point-in-polygon,
rect×polygon intersection, shoelace area, a hierarchical planar cell grid
(the H3/S2 stand-in), and the ellipsoidal Lambert-azimuthal-equal-area
projection matching EPSG:3035's parameters.
"""
