"""Spherical Lambert Azimuthal Equal-Area projection (EPSG:3035 params).

The reference reprojects every vector layer to EPSG:3035
(``/root/reference/src/data_engineering/raster_processor.py:48,54,260``;
CRS pinned at ``src/data_engineering/config.json:2``). pyproj is not in
this container, so the engine vendors the closed-form spherical LAEA
(Snyder 1987, eq. 24-2..24-4) with EPSG:3035's center (10°E, 52°N) and
false origin (4 321 000, 3 210 000) on the authalic sphere. Deterministic,
vectorized numpy; used identically by datagen and the extraction UDFs so
round-trips are exact to float64 noise.
"""

from __future__ import annotations

import numpy as np

R = 6371007.180918475  # authalic radius for GRS80 (m)
LON0 = np.deg2rad(10.0)
LAT0 = np.deg2rad(52.0)
FALSE_E = 4321000.0
FALSE_N = 3210000.0

_SIN0 = np.sin(LAT0)
_COS0 = np.cos(LAT0)


def forward(lon_deg, lat_deg) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) degrees → planar (x, y) meters. Vectorized."""
    lon = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    lat = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    dlon = lon - LON0
    g = _SIN0 * np.sin(lat) + _COS0 * np.cos(lat) * np.cos(dlon)
    # k' = sqrt(2 / (1 + g)); antipode guard
    kp = np.sqrt(2.0 / np.maximum(1.0 + g, 1e-12))
    x = R * kp * np.cos(lat) * np.sin(dlon) + FALSE_E
    y = R * kp * (_COS0 * np.sin(lat) - _SIN0 * np.cos(lat) * np.cos(dlon)) + FALSE_N
    return x, y


def inverse(x, y) -> tuple[np.ndarray, np.ndarray]:
    """Planar (x, y) meters → (lon, lat) degrees. Vectorized."""
    xp = (np.asarray(x, dtype=np.float64) - FALSE_E) / R
    yp = (np.asarray(y, dtype=np.float64) - FALSE_N) / R
    rho = np.sqrt(xp * xp + yp * yp)
    c = 2.0 * np.arcsin(np.clip(rho / 2.0, -1.0, 1.0))
    sinc, cosc = np.sin(c), np.cos(c)
    with np.errstate(invalid="ignore", divide="ignore"):
        lat = np.where(
            rho < 1e-12,
            LAT0,
            np.arcsin(np.clip(cosc * _SIN0 + yp * sinc * _COS0 / np.where(rho == 0, 1, rho), -1, 1)),
        )
        lon = np.where(
            rho < 1e-12,
            LON0,
            LON0
            + np.arctan2(
                xp * sinc, rho * _COS0 * cosc - yp * _SIN0 * sinc
            ),
        )
    return np.rad2deg(lon), np.rad2deg(lat)
