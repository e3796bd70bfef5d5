"""Ellipsoidal Lambert Azimuthal Equal-Area projection — true EPSG:3035.

The reference reprojects every vector layer to EPSG:3035
(``/root/reference/src/data_engineering/raster_processor.py:48,54,260``;
CRS pinned at ``src/data_engineering/config.json:2``). pyproj is not in
this container, so the engine vendors the ELLIPSOIDAL oblique LAEA from
Snyder 1987 (eqs. 3-11/3-12 authalic latitude, 3-18 inverse series,
24-17..24-21 oblique forward, 24-26..24-34 inverse) on GRS80 with
EPSG:3035's natural origin (10°E, 52°N) and false origin
(4 321 000, 3 210 000) — coordinates match the real CRS (the earlier
spherical-authalic approximation deviated up to ~km). Deterministic,
vectorized numpy; used identically by datagen and the extraction UDFs so
round-trips are exact to float64 noise.

Validation (tests/test_geo_kernel.py): natural-origin anchoring,
forward∘inverse roundtrip < 1e-9 deg, and the equal-area property —
finite-difference Jacobian det(∂(x,y)/∂(λ,φ)) equals the ellipsoid
surface element M·N·cosφ to < 1e-6 relative, which pins the projection
to first order everywhere (a spherical implementation fails this at
~1e-3).
"""

from __future__ import annotations

import numpy as np

A = 6378137.0  # GRS80 semi-major (m)
F = 1.0 / 298.257222101
E2 = F * (2.0 - F)
E = np.sqrt(E2)
LON0 = np.deg2rad(10.0)
LAT0 = np.deg2rad(52.0)
FALSE_E = 4321000.0
FALSE_N = 3210000.0


def _q(sinphi: np.ndarray) -> np.ndarray:
    """Snyder eq. 3-12: the authalic-latitude auxiliary q(φ)."""
    esin = E * sinphi
    return (1.0 - E2) * (
        sinphi / (1.0 - E2 * sinphi * sinphi)
        - (1.0 / (2.0 * E)) * np.log((1.0 - esin) / (1.0 + esin))
    )


_QP = float(_q(np.array(1.0)))  # q at the pole
_RQ = A * np.sqrt(_QP / 2.0)  # radius of the authalic sphere (eq. 3-13)
_BETA1 = float(np.arcsin(_q(np.array(np.sin(LAT0))) / _QP))
_SINB1 = np.sin(_BETA1)
_COSB1 = np.cos(_BETA1)
_M1 = float(np.cos(LAT0) / np.sqrt(1.0 - E2 * np.sin(LAT0) ** 2))  # eq. 14-15
_D = A * _M1 / (_RQ * _COSB1)  # eq. 24-20

# Snyder eq. 3-18: β → φ series coefficients
_C2 = E2 / 3.0 + 31.0 * E2**2 / 180.0 + 517.0 * E2**3 / 5040.0
_C4 = 23.0 * E2**2 / 360.0 + 251.0 * E2**3 / 3780.0
_C6 = 761.0 * E2**3 / 45360.0


def forward(lon_deg, lat_deg) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) degrees → EPSG:3035 (x, y) meters. Vectorized."""
    lon = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    lat = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    dlon = lon - LON0
    sinb = np.clip(_q(np.sin(lat)) / _QP, -1.0, 1.0)
    cosb = np.sqrt(np.maximum(1.0 - sinb * sinb, 0.0))
    g = _SINB1 * sinb + _COSB1 * cosb * np.cos(dlon)
    b = _RQ * np.sqrt(2.0 / np.maximum(1.0 + g, 1e-12))  # eq. 24-19
    x = b * _D * cosb * np.sin(dlon) + FALSE_E  # eq. 24-17
    y = (b / _D) * (_COSB1 * sinb - _SINB1 * cosb * np.cos(dlon)) + FALSE_N
    return x, y


def inverse(x, y) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:3035 (x, y) meters → (lon, lat) degrees. Vectorized."""
    xp = np.asarray(x, dtype=np.float64) - FALSE_E
    yp = np.asarray(y, dtype=np.float64) - FALSE_N
    rho = np.sqrt((xp / _D) ** 2 + (_D * yp) ** 2)  # eq. 24-28
    ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * _RQ), -1.0, 1.0))  # eq. 24-29
    sin_ce, cos_ce = np.sin(ce), np.cos(ce)
    safe_rho = np.where(rho < 1e-12, 1.0, rho)
    sinb = np.clip(
        cos_ce * _SINB1 + (_D * yp * sin_ce * _COSB1) / safe_rho, -1.0, 1.0
    )  # from eq. 24-31's q via the authalic sphere
    beta = np.where(rho < 1e-12, _BETA1, np.arcsin(sinb))
    lon = np.where(
        rho < 1e-12,
        LON0,
        LON0
        + np.arctan2(
            xp * sin_ce,
            _D * safe_rho * _COSB1 * cos_ce - _D * _D * yp * _SINB1 * sin_ce,
        ),  # eq. 24-34
    )
    # eq. 3-18: authalic → geodetic latitude
    lat = (
        beta
        + _C2 * np.sin(2.0 * beta)
        + _C4 * np.sin(4.0 * beta)
        + _C6 * np.sin(6.0 * beta)
    )
    return np.rad2deg(lon), np.rad2deg(lat)
