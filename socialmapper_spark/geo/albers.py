"""EPSG:5070 (NAD83 / Conus Albers) forward projection, pure numpy.

The reference does all distance math in EPSG:5070 meters via pyproj
(/root/reference/socialmapper/distance/engine.py:39-50, :111-151). pyproj
is not installed in this container, so we implement the ellipsoidal
Albers equal-area conic forward transform directly (Snyder, "Map
Projections — A Working Manual", USGS PP 1395, eqs. 14-1..14-6) on the
GRS80 ellipsoid with the EPSG:5070 parameters. Agreement with proj is
sub-millimeter over CONUS; more importantly it is the single definition
used by BOTH the Spark engine and the DuckDB/pandas oracles, so parity is
exact by construction.
"""

from __future__ import annotations

import numpy as np

_A = 6378137.0                     # GRS80 semi-major axis (m)
_F = 1.0 / 298.257222101           # GRS80 flattening
_E2 = 2.0 * _F - _F * _F
_E = np.sqrt(_E2)

_LAT0 = np.deg2rad(23.0)           # latitude of origin
_LON0 = np.deg2rad(-96.0)          # central meridian
_LAT1 = np.deg2rad(29.5)           # 1st standard parallel
_LAT2 = np.deg2rad(45.5)           # 2nd standard parallel


def _q(phi):
    s = np.sin(phi)
    return (1.0 - _E2) * (
        s / (1.0 - _E2 * s * s)
        - (1.0 / (2.0 * _E)) * np.log((1.0 - _E * s) / (1.0 + _E * s))
    )


def _m(phi):
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - _E2 * s * s)


_M1 = _m(_LAT1)
_M2 = _m(_LAT2)
_Q0 = _q(_LAT0)
_Q1 = _q(_LAT1)
_Q2 = _q(_LAT2)
_N = (_M1 * _M1 - _M2 * _M2) / (_Q2 - _Q1)
_C = _M1 * _M1 + _N * _Q1
_RHO0 = _A * np.sqrt(_C - _N * _Q0) / _N


def albers5070_forward(lat, lon) -> tuple[np.ndarray, np.ndarray]:
    """(lat, lon) degrees → (x, y) EPSG:5070 meters. Vectorized float64."""
    phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
    lam = np.deg2rad(np.asarray(lon, dtype=np.float64))
    q = _q(phi)
    rho = _A * np.sqrt(_C - _N * q) / _N
    theta = _N * (lam - _LON0)
    x = rho * np.sin(theta)
    y = _RHO0 - rho * np.cos(theta)
    return x, y


def albers5070_inverse(x, y) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) EPSG:5070 meters → (lat, lon) degrees. Vectorized float64.

    Snyder PP 1395 eqs. 14-10, 14-11 for rho/theta, then the latitude from
    q by Newton iteration on eq. 3-16 (12 iterations — converges to double
    precision in ≤5 for CONUS latitudes; fixed count keeps it branch-free
    and deterministic). Round-trips with :func:`albers5070_forward` to
    ~1e-9 degrees (≈0.1 mm), asserted in tests.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    rho = np.sqrt(x * x + (_RHO0 - y) ** 2)
    theta = np.arctan2(x, _RHO0 - y)  # N > 0 for EPSG:5070
    lam = _LON0 + theta / _N
    q = (_C - (rho * _N / _A) ** 2) / _N
    # initial guess: spherical approximation
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(12):
        s = np.sin(phi)
        one_m = 1.0 - _E2 * s * s
        phi = phi + (one_m ** 2 / (2.0 * np.cos(phi))) * (
            q / (1.0 - _E2)
            - s / one_m
            + (1.0 / (2.0 * _E)) * np.log((1.0 - _E * s) / (1.0 + _E * s))
        )
    return np.rad2deg(phi), np.rad2deg(lam)
