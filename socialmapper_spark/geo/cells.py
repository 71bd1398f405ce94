"""Deterministic hierarchical cell index (H3-style API, square grid).

The container has no ``h3`` wheel, so per SURVEY.md §7.3.1 we use the
documented deterministic fallback: an equirectangular power-of-two grid
with the same API surface the engine needs from H3 — ``latlng_to_cell``
(here :func:`cell_np` / :func:`cell_col`), ``grid_disk`` (square k-ring),
``cell_to_parent`` — and the same role in the engine: locality key for
salted hash joins, prefilter key for the two-phase PIP join, and k-ring
expansion for kNN (reference kNN semantics: brute-force min distance,
``/root/reference/socialmapper/distance/engine.py:54-85``).

Layout (all exact integer/power-of-two arithmetic, identical in numpy
int64/float64 and Spark long/double — the Spark column expression and the
numpy twin are bit-identical by construction):

- cell edge at resolution r: ``360 / 2**(r+7)`` degrees
  (r7≈0.0220°, r8≈0.0110°, r9≈0.0055° — comparable in area to H3 res 7/8/9)
- ``ix = floor((lon+180)/size) mod 2**(r+7)``  (longitude wraps)
- ``iy = clamp(floor((lat+90)/size), 0, 2**(r+6)-1)``
- ``cell_id = r * 2**58 + ix * 2**29 + iy``  (fits in int64 for r ≤ 22)

Parent/child: one resolution step halves the cell edge, so the parent
index is ``ix >> 1, iy >> 1`` — a pure arithmetic truncation that Catalyst
evaluates JVM-side with no UDF.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

_R_SHIFT = 2**58
_IX_SHIFT = 2**29
MAX_RES = 22


def cell_size_deg(res: int) -> float:
    """Cell edge length in degrees at resolution ``res`` (exact binary)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution out of range: {res}")
    return 360.0 / (1 << (res + 7))


def _nx(res: int) -> int:
    return 1 << (res + 7)


def _ny(res: int) -> int:
    return 1 << (res + 6)


# ---------------------------------------------------------------------------
# numpy twin (oracle / golden generation / driver-side polygon prep)
# ---------------------------------------------------------------------------

def cell_np(lat, lon, res: int) -> np.ndarray:
    """Vectorized cell id for float64 lat/lon arrays. Mirrors cell_col."""
    size = cell_size_deg(res)
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    ix = np.floor((lon + 180.0) / size).astype(np.int64) % _nx(res)
    iy = np.clip(np.floor((lat + 90.0) / size).astype(np.int64), 0, _ny(res) - 1)
    return np.int64(res) * _R_SHIFT + ix * _IX_SHIFT + iy


def decode_cell(cell: int) -> tuple[int, int, int]:
    """cell id → (res, ix, iy)."""
    cell = int(cell)
    res = cell // _R_SHIFT
    rem = cell % _R_SHIFT
    return res, rem // _IX_SHIFT, rem % _IX_SHIFT


def encode_ixy(res: int, ix: int, iy: int) -> int:
    return res * _R_SHIFT + (ix % _nx(res)) * _IX_SHIFT + iy


def cell_bounds(cell: int) -> tuple[float, float, float, float]:
    """cell id → (lat_min, lat_max, lon_min, lon_max)."""
    res, ix, iy = decode_cell(cell)
    size = cell_size_deg(res)
    lon_min = ix * size - 180.0
    lat_min = iy * size - 90.0
    return lat_min, lat_min + size, lon_min, lon_min + size


def cell_center(cell: int) -> tuple[float, float]:
    lat_min, lat_max, lon_min, lon_max = cell_bounds(cell)
    return (lat_min + lat_max) / 2.0, (lon_min + lon_max) / 2.0


def cell_to_parent(cell: int, parent_res: int) -> int:
    res, ix, iy = decode_cell(cell)
    if parent_res > res:
        raise ValueError(f"parent_res {parent_res} > res {res}")
    dr = res - parent_res
    return encode_ixy(parent_res, ix >> dr, iy >> dr)


def grid_disk(cell: int, k: int) -> list[int]:
    """All cells within Chebyshev distance k (the square k-ring disk).

    Longitude wraps; rows whose iy falls off the poles are dropped.
    Deterministic order: dy-major then dx, like H3's ring ordering is
    fixed — callers must not rely on a particular order anyway.
    """
    res, ix, iy = decode_cell(cell)
    nx, ny = _nx(res), _ny(res)
    out = []
    for dy in range(-k, k + 1):
        y = iy + dy
        if y < 0 or y >= ny:
            continue
        for dx in range(-k, k + 1):
            out.append(res * _R_SHIFT + ((ix + dx) % nx) * _IX_SHIFT + y)
    return out


def covering_cells(rings: list[np.ndarray], res: int) -> list[int]:
    """Over-approximate cell cover of a polygon at resolution ``res``.

    Returns every cell whose square intersects the polygon's bounding box.
    Over-approximation is safe: phase 1 of the two-phase join must never
    produce false negatives (SURVEY.md §4 O3); phase 2 (exact ray-casting
    refine) removes false positives. ``rings`` is [exterior, holes...],
    each an (n,2) float64 array of (lon, lat) vertices.
    """
    ext = np.asarray(rings[0], dtype=np.float64)
    lon_min, lat_min = ext.min(axis=0)
    lon_max, lat_max = ext.max(axis=0)
    size = cell_size_deg(res)
    ix0 = int(np.floor((lon_min + 180.0) / size))
    ix1 = int(np.floor((lon_max + 180.0) / size))
    iy0 = max(0, int(np.floor((lat_min + 90.0) / size)))
    iy1 = min(_ny(res) - 1, int(np.floor((lat_max + 90.0) / size)))
    nx = _nx(res)
    return [
        res * _R_SHIFT + (ix % nx) * _IX_SHIFT + iy
        for iy in range(iy0, iy1 + 1)
        for ix in range(ix0, ix1 + 1)
    ]


def _ring_boundary_cover(ring: np.ndarray, res: int) -> np.ndarray:
    """(ix, iy) pairs of every cell a ring's edges pass through (superset).

    Fully vectorized supercover: each edge is subdivided into pieces no
    longer than one cell edge per axis, and each piece contributes the
    (≤2×2) cells of its own bbox — a tight superset of the true segment
    supercover with O(perimeter / cell_size) output, so a long diagonal
    edge no longer inflates the cover quadratically like a bbox would.
    """
    size = cell_size_deg(res)
    ring = np.asarray(ring, dtype=np.float64)
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    npiece = np.maximum(
        1,
        np.ceil(np.maximum(np.abs(x2 - x1), np.abs(y2 - y1)) / size).astype(np.int64),
    )
    e = np.repeat(np.arange(ring.shape[0]), npiece)
    k = np.arange(npiece.sum()) - np.repeat(np.cumsum(npiece) - npiece, npiece)
    t0 = k / npiece[e]
    t1 = (k + 1) / npiece[e]
    ax = x1[e] + (x2[e] - x1[e]) * t0
    ay = y1[e] + (y2[e] - y1[e]) * t0
    bx = x1[e] + (x2[e] - x1[e]) * t1
    by = y1[e] + (y2[e] - y1[e]) * t1
    ix0 = np.floor((np.minimum(ax, bx) + 180.0) / size).astype(np.int64)
    ix1 = np.floor((np.maximum(ax, bx) + 180.0) / size).astype(np.int64)
    iy0 = np.floor((np.minimum(ay, by) + 90.0) / size).astype(np.int64)
    iy1 = np.floor((np.maximum(ay, by) + 90.0) / size).astype(np.int64)
    # each piece spans at most 2 cells per axis; emit the 4 bbox corners
    ix = np.concatenate([ix0, ix1, ix0, ix1])
    iy = np.concatenate([iy0, iy0, iy1, iy1])
    return np.unique(np.stack([ix, iy], axis=1), axis=0)


def polygon_cover_cells(polys: list[list[np.ndarray]], res: int) -> np.ndarray:
    """Cells intersecting the polygon itself (not just its bbox) — int64 ids.

    Still an over-approximation (no false negatives, SURVEY.md §4 O3):
    boundary cells come from the exterior-edge supercover; interior cells
    are the bbox candidates whose center lies inside the exterior ring.
    Holes are ignored (cells inside a hole become false positives that the
    exact refine removes — over-approximation is the safe direction).
    ``polys`` is a list of MultiPolygon members, each [exterior, holes...].
    """
    from socialmapper_spark.geo.pip import points_in_ring

    size = cell_size_deg(res)
    nx, ny = _nx(res), _ny(res)
    parts = []
    for rings in polys:
        ext = np.asarray(rings[0], dtype=np.float64)
        parts.append(_ring_boundary_cover(ext, res))
        lon_min, lat_min = ext.min(axis=0)
        lon_max, lat_max = ext.max(axis=0)
        ix0 = int(np.floor((lon_min + 180.0) / size))
        ix1 = int(np.floor((lon_max + 180.0) / size))
        iy0 = int(np.floor((lat_min + 90.0) / size))
        iy1 = int(np.floor((lat_max + 90.0) / size))
        gx, gy = np.meshgrid(
            np.arange(ix0, ix1 + 1), np.arange(iy0, iy1 + 1), indexing="ij"
        )
        gx = gx.ravel()
        gy = gy.ravel()
        cx = (gx + 0.5) * size - 180.0
        cy = (gy + 0.5) * size - 90.0
        inside = points_in_ring(cx, cy, ext)
        parts.append(np.stack([gx[inside], gy[inside]], axis=1))
    ixy = np.unique(np.concatenate(parts, axis=0), axis=0)
    ix = ixy[:, 0] % nx
    iy = np.clip(ixy[:, 1], 0, ny - 1)
    return np.unique(np.int64(res) * _R_SHIFT + ix * _IX_SHIFT + iy)


# ---------------------------------------------------------------------------
# Spark column expressions (pure Catalyst — no UDF on the hot path)
# ---------------------------------------------------------------------------

def cell_col(lat: Column, lon: Column, res: int) -> Column:
    """Cell id as a pure column expression (whole-stage-codegen friendly).

    Bit-identical to :func:`cell_np`: same float64 ops (power-of-two
    divisor → exact), same int64 arithmetic.
    """
    size = cell_size_deg(res)
    ix = F.pmod(F.floor((lon + F.lit(180.0)) / F.lit(size)), F.lit(_nx(res)))
    iy = F.least(
        F.greatest(F.floor((lat + F.lit(90.0)) / F.lit(size)), F.lit(0)),
        F.lit(_ny(res) - 1),
    )
    return (
        F.lit(res).cast("long") * F.lit(_R_SHIFT)
        + ix.cast("long") * F.lit(_IX_SHIFT)
        + iy.cast("long")
    )


def grid_disk_col(cell: Column, res: int, k: int) -> Column:
    """array<long> of all cells within Chebyshev distance ``k`` — the pure
    Catalyst twin of :func:`grid_disk` (longitude wraps via pmod, rows off
    the poles drop out as filtered NULLs). Keeping the k-ring expansion
    inside the plan means a million-POI table explodes distributed on
    executors instead of in a driver loop."""
    rem = F.pmod(cell, F.lit(_R_SHIFT))
    ix = F.floor(rem / F.lit(_IX_SHIFT)).cast("long")
    iy = (rem - ix * F.lit(_IX_SHIFT)).cast("long")
    ny = F.lit(_ny(res))
    base = F.lit(res).cast("long") * F.lit(_R_SHIFT)
    arr = F.flatten(
        F.transform(
            F.sequence(F.lit(-k), F.lit(k)),
            lambda dy: F.transform(
                F.sequence(F.lit(-k), F.lit(k)),
                lambda dx: F.when(
                    ((iy + dy) >= 0) & ((iy + dy) < ny),
                    base
                    + F.pmod(ix + dx, F.lit(_nx(res))) * F.lit(_IX_SHIFT)
                    + (iy + dy),
                ),
            ),
        )
    )
    return F.filter(arr, lambda c: c.isNotNull())


def cell_to_parent_col(cell: Column, res: int, parent_res: int) -> Column:
    """Parent cell id as a column expression (res is statically known)."""
    dr = res - parent_res
    rem = F.pmod(cell, F.lit(_R_SHIFT))
    ix = F.floor(rem / F.lit(_IX_SHIFT)).cast("long")
    iy = (rem - ix * F.lit(_IX_SHIFT)).cast("long")
    return (
        F.lit(parent_res).cast("long") * F.lit(_R_SHIFT)
        + F.floor(ix / F.lit(1 << dr)).cast("long") * F.lit(_IX_SHIFT)
        + F.floor(iy / F.lit(1 << dr)).cast("long")
    )
