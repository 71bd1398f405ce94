"""Minimal WKB (well-known binary) Polygon/MultiPolygon codec.

Geometry travels through the engine as a WKB ``binary`` column (SURVEY.md
§1.2) — standard little-endian ISO WKB, interoperable with GeoPandas /
DuckDB-spatial / Sedona if a user brings real block-group shapefiles.
Only Polygon (type 3) and MultiPolygon (type 6) are needed; shapely is
not installed, so this is a ~60-line struct codec.
"""

from __future__ import annotations

import struct

import numpy as np

_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6


def polygon_to_wkb(rings: list[np.ndarray]) -> bytes:
    """[exterior, holes...] (each (n,2) float64, unclosed OK) → WKB Polygon.

    Rings are closed on write (first vertex appended) per spec.
    """
    out = [struct.pack("<BI", 1, _WKB_POLYGON), struct.pack("<I", len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        out.append(struct.pack("<I", ring.shape[0]))
        out.append(ring.astype("<f8").tobytes())
    return b"".join(out)


def _read_rings(buf: bytes, off: int) -> tuple[list[np.ndarray], int]:
    (n_rings,) = struct.unpack_from("<I", buf, off)
    off += 4
    rings = []
    for _ in range(n_rings):
        (n_pts,) = struct.unpack_from("<I", buf, off)
        off += 4
        pts = np.frombuffer(buf, dtype="<f8", count=n_pts * 2, offset=off)
        off += n_pts * 16
        rings.append(pts.reshape(n_pts, 2).copy())
    return rings, off


def wkb_to_rings(buf: bytes) -> list[list[np.ndarray]]:
    """WKB → list of polygons, each a list [exterior, holes...].

    A Polygon yields a single-element list; MultiPolygon yields one entry
    per member polygon. Coordinates come back as (x=lon, y=lat) float64.
    """
    byte_order, geom_type = struct.unpack_from("<BI", buf, 0)
    if byte_order != 1:
        raise ValueError("only little-endian WKB supported")
    geom_type &= 0xFF  # strip any SRID/dimension flag bits
    if geom_type == _WKB_POLYGON:
        rings, _ = _read_rings(buf, 5)
        return [rings]
    if geom_type == _WKB_MULTIPOLYGON:
        (n_polys,) = struct.unpack_from("<I", buf, 5)
        off = 9
        polys = []
        for _ in range(n_polys):
            # each member: byte order + type header, then rings
            off += 5
            rings, off = _read_rings(buf, off)
            polys.append(rings)
        return polys
    raise ValueError(f"unsupported WKB geometry type {geom_type}")
