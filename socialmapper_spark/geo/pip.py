"""Vectorized point-in-polygon (ray casting, even-odd rule), pure numpy.

Replaces shapely's ``contains_xy`` (not installed). Semantics follow the
reference's assignment rule — a point belongs to the polygon containing it
(/root/reference/socialmapper/census/infrastructure/geocoder.py:41-83
outsourced this to the Census geocoder; we compute it locally). Fixture
polygons avoid boundary-degenerate points (FIXTURES.md §3), so the chosen
half-open edge rule never changes a test answer; the rule itself is the
standard crossing-number convention: an edge from (x1,y1)→(x2,y2) is
crossed when ``(y1 > py) != (y2 > py)`` and the intersection is strictly
right of the point.
"""

from __future__ import annotations

import numpy as np


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd test of points against one closed ring.

    px, py: (n,) float64 point coords (lon, lat order is up to the caller —
    just be consistent). ring: (m,2) float64 vertices (first != last is OK;
    closure is implicit).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    ring = np.asarray(ring, dtype=np.float64)
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    inside = np.zeros(px.shape[0], dtype=bool)
    # Loop over edges (polygons are small: grid squares / simplified hulls),
    # vectorized over points (the big side).
    for i in range(ring.shape[0]):
        cond = (y1[i] > py) != (y2[i] > py)
        if not cond.any():
            continue
        xint = (x2[i] - x1[i]) * (py - y1[i]) / (y2[i] - y1[i]) + x1[i]
        inside ^= cond & (px < xint)
    return inside


def points_in_polygon(
    px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]
) -> np.ndarray:
    """Even-odd test vs a polygon with holes: [exterior, hole1, ...]."""
    inside = points_in_ring(px, py, rings[0])
    for hole in rings[1:]:
        inside &= ~points_in_ring(px, py, hole)
    return inside
