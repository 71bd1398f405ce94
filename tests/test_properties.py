"""Property-based tests (hypothesis) for the pure geo kernel — SURVEY.md
§5.2.4 invariants. No SparkSession needed; these run in milliseconds and
pin the algebraic contracts the distributed operators rely on."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from socialmapper_spark.geo.albers import albers5070_forward, albers5070_inverse
from socialmapper_spark.geo.cells import (
    cell_bounds,
    cell_np,
    cell_to_parent,
    decode_cell,
    grid_disk,
)
from socialmapper_spark.geo.geoparse import GAZETTEER, geoparse_py
from socialmapper_spark.geo.hull import convex_hull
from socialmapper_spark.geo.pip import points_in_polygon
from socialmapper_spark.geo.wkb import polygon_to_wkb, wkb_to_rings

lat_st = st.floats(min_value=-85.0, max_value=85.0, allow_nan=False)
lon_st = st.floats(min_value=-179.99, max_value=179.99, allow_nan=False)
res_st = st.integers(min_value=5, max_value=10)


@given(lat=lat_st, lon=lon_st, res=res_st)
@settings(max_examples=200, deadline=None)
def test_cell_bounds_contain_point(lat, lon, res):
    cell = int(cell_np([lat], [lon], res)[0])
    lat_min, lat_max, lon_min, lon_max = cell_bounds(cell)
    assert lat_min - 1e-9 <= lat <= lat_max + 1e-9
    # longitude wraps: the offset of the point from the cell start, taken
    # mod 360, must fit within the cell width — OR sit within float epsilon
    # below the cell start (the encode computes floor((lon+180)/size); when
    # lon+180 rounds UP to the boundary, the point legitimately lands in
    # the next cell — identical in numpy and Catalyst, which is the
    # contract that matters)
    off = (lon - lon_min) % 360.0
    assert off <= (lon_max - lon_min) + 1e-9 or off >= 360.0 - 1e-9


@given(lat=lat_st, lon=lon_st, res=st.integers(min_value=6, max_value=10))
@settings(max_examples=200, deadline=None)
def test_parent_contains_child(lat, lon, res):
    child = int(cell_np([lat], [lon], res)[0])
    parent = cell_to_parent(child, res - 1)
    # the parent computed from the point directly must agree
    assert parent == int(cell_np([lat], [lon], res - 1)[0])
    pr, pix, piy = decode_cell(parent)
    cr, cix, ciy = decode_cell(child)
    assert (cix >> 1, ciy >> 1) == (pix, piy)


@given(lat=lat_st, lon=lon_st, res=res_st, k=st.integers(min_value=0, max_value=3))
@settings(max_examples=100, deadline=None)
def test_grid_disk_contains_center(lat, lon, res, k):
    cell = int(cell_np([lat], [lon], res)[0])
    disk = grid_disk(cell, k)
    assert cell in disk
    assert len(disk) <= (2 * k + 1) ** 2
    assert len(set(disk)) == len(disk)


@given(
    lat=st.floats(min_value=25.0, max_value=49.0, allow_nan=False),
    lon=st.floats(min_value=-124.0, max_value=-67.0, allow_nan=False),
)
@settings(max_examples=200, deadline=None)
def test_albers_roundtrip(lat, lon):
    x, y = albers5070_forward([lat], [lon])
    lat2, lon2 = albers5070_inverse(x, y)
    assert abs(float(lat2[0]) - lat) < 1e-9
    assert abs(float(lon2[0]) - lon) < 1e-9


@given(
    pts=st.lists(
        st.tuples(
            st.floats(min_value=-79.5, max_value=-78.0, allow_nan=False),
            st.floats(min_value=35.0, max_value=36.0, allow_nan=False),
        ),
        min_size=3,
        max_size=40,
    )
)
@settings(max_examples=100, deadline=None)
def test_wkb_roundtrip_and_centroid_in_hull(pts):
    cloud = np.array(pts, dtype=np.float64)
    hull = convex_hull(cloud)
    if hull.shape[0] < 3:
        return  # degenerate (collinear) — nothing to assert
    x, y = hull[:, 0], hull[:, 1]
    area2 = abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))
    if area2 < 1e-9:
        return  # sliver polygon: ray-cast boundary behavior is undefined
    rt = wkb_to_rings(polygon_to_wkb([hull]))
    assert len(rt) == 1
    ring = rt[0][0]
    # codec closes the ring; vertices preserved bit-exactly
    assert np.array_equal(ring[:-1], hull) or np.array_equal(ring, hull)
    # the mean of the hull vertices is inside the hull (convexity)
    cx, cy = hull[:, 0].mean(), hull[:, 1].mean()
    inside = points_in_polygon(np.array([cx]), np.array([cy]), [hull])
    assert bool(inside[0])
    # a point far outside the fixture box is outside
    outside = points_in_polygon(np.array([0.0]), np.array([0.0]), [hull])
    assert not bool(outside[0])


@given(text=st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_geoparse_total_and_deterministic(text):
    lat1, lon1, m1 = geoparse_py(text)
    lat2, lon2, m2 = geoparse_py(text)
    assert (lat1, lon1, m1) == (lat2, lon2, m2)  # pure function
    assert all(name in GAZETTEER for name in m1)
    if lat1 is not None:
        assert -90.0 <= lat1 <= 90.0 and -180.0 <= lon1 <= 180.0
    # mentions appear in canonical gazetteer order
    order = {n: i for i, n in enumerate(GAZETTEER)}
    assert m1 == sorted(m1, key=order.__getitem__)
