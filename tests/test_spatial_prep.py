"""Distributed polygon-index prep + F9 simplify (VERDICT r1 items 2/3).

Pins that the polygon side of the two-phase PIP join scales: the cover
and geometry shipping happen inside the Spark plan (mapInPandas +
broadcast hash join), never via a driver-side geometry loop, and the
cover wraps the polygon rather than its bbox.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from socialmapper_spark.geo.cells import (
    cell_np,
    covering_cells,
    polygon_cover_cells,
)
from socialmapper_spark.geo.simplify import simplify_polygon, simplify_ring
from socialmapper_spark.geo.wkb import polygon_to_wkb
from socialmapper_spark.operators.spatial_join import prepare_polygons, spatial_join


def _circle(cx, cy, r, n):
    t = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    return np.stack([cx + r * np.cos(t), cy + r * np.sin(t)], axis=1)


def _area(ring):
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


class TestSimplify:
    def test_zero_tolerance_is_identity(self):
        ring = _circle(0, 0, 1.0, 64)
        assert np.array_equal(simplify_ring(ring, 0.0), ring)

    def test_collinear_points_removed_corners_kept(self):
        # square with 9 collinear points per edge — DP must keep exactly
        # the 4 corners (plus anchors, which are corners here)
        edge = np.linspace(0.0, 1.0, 11)[:-1]
        ring = np.concatenate(
            [
                np.stack([edge, np.zeros_like(edge)], axis=1),
                np.stack([np.ones_like(edge), edge], axis=1),
                np.stack([1.0 - edge, np.ones_like(edge)], axis=1),
                np.stack([np.zeros_like(edge), 1.0 - edge], axis=1),
            ]
        )
        out = simplify_ring(ring, 1e-9)
        assert out.shape[0] == 4
        assert {tuple(v) for v in out} == {(0, 0), (1, 0), (1, 1), (0, 1)}

    def test_circle_reduces_but_preserves_area(self):
        ring = _circle(10.0, 20.0, 1.0, 720)
        out = simplify_ring(ring, 0.01)
        assert 8 <= out.shape[0] < 200
        assert abs(_area(out) - _area(ring)) / _area(ring) < 0.02
        # simplified vertices are a subset of the originals (DP property)
        orig = {tuple(v) for v in ring}
        assert all(tuple(v) in orig for v in out)

    def test_tiny_rings_returned_unchanged(self):
        tri = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        assert np.array_equal(simplify_ring(tri, 10.0), tri)

    def test_polygon_with_hole(self):
        outer = _circle(0, 0, 2.0, 360)
        hole = _circle(0, 0, 0.5, 180)
        out = simplify_polygon([outer, hole], 0.01)
        assert len(out) == 2
        assert out[0].shape[0] < 360 and out[1].shape[0] < 180


class TestPolygonCover:
    def test_diagonal_sliver_much_tighter_than_bbox(self):
        # thin diagonal strip across ~1 degree: bbox cover is O(n^2) cells,
        # polygon cover must be O(n)
        t = np.linspace(0.0, 1.0, 200)
        up = np.stack([-100.0 + t, 35.0 + t + 0.002], axis=1)
        dn = np.stack([-100.0 + t[::-1], 35.0 + t[::-1] - 0.002], axis=1)
        ring = np.concatenate([up, dn])
        tight = polygon_cover_cells([[ring]], 7)
        loose = covering_cells([ring], 7)
        assert len(tight) < len(loose) / 5
        assert set(tight) <= set(loose)

    def test_cover_has_no_false_negatives(self):
        rng = np.random.default_rng(7)
        ring = _circle(-95.0, 40.0, 0.3, 33)
        cover = set(polygon_cover_cells([[ring]], 8).tolist())
        # random interior points (rejection-sampled inside the circle)
        ang = rng.uniform(0, 2 * np.pi, 5000)
        rad = 0.3 * np.sqrt(rng.uniform(0, 1, 5000)) * 0.999
        lon = -95.0 + rad * np.cos(ang)
        lat = 40.0 + rad * np.sin(ang)
        cells = cell_np(lat, lon, 8)
        assert set(cells.tolist()) <= cover

    def test_polygon_fully_inside_one_cell(self):
        ring = _circle(-95.0, 40.0, 1e-4, 16)
        cover = polygon_cover_cells([[ring]], 7)
        assert len(cover) >= 1
        assert cell_np([40.0], [-95.0], 7)[0] in set(cover.tolist())


@pytest.fixture(scope="module")
def grid_polygons(spark):
    """10k 0.01°×0.01° squares tiling a 1°×1° area — generated inside the
    plan (range → mapInPandas), so the polygon table itself never exists
    on the driver."""

    def gen(batches):
        for pdf in batches:
            i = pdf["id"].to_numpy()
            x0 = -100.0 + (i % 100) * 0.01
            y0 = 35.0 + (i // 100) * 0.01
            wkbs = [
                polygon_to_wkb(
                    [
                        np.array(
                            [
                                [x, y],
                                [x + 0.01, y],
                                [x + 0.01, y + 0.01],
                                [x, y + 0.01],
                            ]
                        )
                    ]
                )
                for x, y in zip(x0, y0)
            ]
            yield pd.DataFrame(
                {"poly_id": [f"sq{v:05d}" for v in i], "geometry_wkb": wkbs}
            )

    return (
        spark.range(10000)
        .repartition(8)
        .mapInPandas(gen, "poly_id string, geometry_wkb binary")
    )


def test_prepare_polygons_is_distributed(spark, grid_polygons):
    """Index build over 10k polygons with zero driver-side geometry work:
    the cover plan is scan → MapInPandas, no ExistingRDD (the signature of
    a driver-collected createDataFrame)."""
    index = prepare_polygons(spark, grid_polygons)
    plan = index.cells_df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "ExistingRDD" not in plan
    gplan = index.geoms_df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in gplan
    # 10k tiny squares at res 7 → roughly 1-4 cover cells each
    n = index.cells_df.count()
    assert 10000 <= n < 50000


def test_grid_assignment_exact(spark, grid_polygons):
    """Each square-center point lands in exactly its own square."""
    pts = spark.range(500).select(
        F.concat(F.lit("p"), F.col("id")).alias("pt_id"),
        (F.lit(35.005) + F.floor(F.col("id") / 25) * 0.01).alias("lat"),
        (F.lit(-99.995) + (F.col("id") % 25) * 0.01).alias("lon"),
    )
    index = prepare_polygons(spark, grid_polygons)
    out = spatial_join(pts, index).select("pt_id", "poly_id").collect()
    assert len(out) == 500
    for r in out:
        i = int(r["pt_id"][1:])
        expect = (i // 25) * 100 + (i % 25)  # row*100 + col
        assert r["poly_id"] == f"sq{expect:05d}"


def test_simplified_index_still_assigns_interior_points(spark):
    ring = _circle(-98.0, 37.0, 0.5, 720)
    pdf = pd.DataFrame(
        {"poly_id": ["c1"], "geometry_wkb": [polygon_to_wkb([ring])]}
    )
    polygons = spark.createDataFrame(pdf)
    index = prepare_polygons(spark, polygons, simplify_tolerance_deg=0.001)
    # geometry actually shrank (edge list well below the original 720)
    n_edges = len(index.geoms_df.collect()[0]["__edges"])
    assert 3 <= n_edges < 240
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "pt_id": ["in1", "in2", "out1"],
                "lon": [-98.0, -97.8, -96.0],
                "lat": [37.0, 37.1, 37.0],
            }
        )
    )
    got = {r["pt_id"] for r in spatial_join(pts, index).collect()}
    assert got == {"in1", "in2"}


def test_grid_disk_col_matches_python_twin(spark):
    """Pure-Catalyst k-ring expansion = the numpy/python grid_disk,
    including longitude wrap and pole truncation."""
    from socialmapper_spark.geo.cells import cell_np, grid_disk, grid_disk_col

    pts = [
        (35.78, -78.64),   # interior
        (0.0, 179.99),     # anti-meridian wrap
        (89.9, 10.0),      # near-pole truncation
        (-89.9, -170.0),   # south pole truncation + wrap
    ]
    cells = [int(cell_np(la, lo, 7)) for la, lo in pts]
    df = spark.createDataFrame([(c,) for c in cells], "cell long")
    got = {
        r["cell"]: sorted(r["disk"])
        for r in df.select(
            "cell", grid_disk_col(F.col("cell"), 7, 3).alias("disk")
        ).collect()
    }
    for c in cells:
        assert got[c] == sorted(grid_disk(c, 3)), f"mismatch for cell {c}"


def test_flagship_plan_zero_per_row_python(spark, geo_small):
    """north_star: 'zero per-row Python'. The flagship plan must contain
    no Arrow/Batch Python eval on the page side; the only Python nodes
    are the MapInPandas polygon-prep over the tiny polygon table."""
    from socialmapper_spark.pipeline import flagship_query

    plan = (
        flagship_query(
            spark,
            spark.read.parquet(f"{geo_small}/pages.parquet"),
            spark.read.parquet(f"{geo_small}/polygons.parquet"),
            spark.read.parquet(f"{geo_small}/census_long.parquet"),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_knn_kring_plan_stays_in_plan(spark, geo_small):
    """The POI ring expansion must be pure Catalyst: no ExistingRDD scan
    (driver-built rows) anywhere in the kring candidate plan, and the
    candidate join must be a broadcast hash join."""
    from socialmapper_spark.operators.knn import knn_join
    from socialmapper_spark.pipeline import geoparse_pages

    pages = spark.read.parquet(f"{geo_small}/pages.parquet")
    pois = spark.read.parquet(f"{geo_small}/pois.parquet").filter(F.col("lat") <= 90)
    # rings pinned: auto-sizing on this sparse fixture would (correctly)
    # degrade to the broadcast plan — this test asserts the kring plan shape
    out = knn_join(spark, geoparse_pages(pages), pois, k=1, strategy="kring", rings=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan
    assert "BroadcastHashJoin" in plan
    assert "Generate explode" in plan  # the in-plan grid_disk expansion


def test_page_assignments_stream_equals_batch(spark, geo_small):
    """Streaming (stream-static broadcast joins, 3 micro-batches) must
    equal the batch assignment plan row-for-row."""
    from socialmapper_spark.pipeline import page_assignments
    from socialmapper_spark.streaming.pipeline import page_assignments_stream

    pages = spark.read.parquet(f"{geo_small}/pages.parquet")
    polygons = spark.read.parquet(f"{geo_small}/polygons.parquet")
    batch = {
        (r["url"], r["poly_id"])
        for r in page_assignments(spark, pages, polygons).collect()
    }
    stream = {
        (r["url"], r["poly_id"])
        for r in page_assignments_stream(spark, str(geo_small), polygons).collect()
    }
    assert stream == batch and len(batch) > 1000


def test_knn_kring_at_20k_pois_matches_broadcast(spark, geo_small):
    """The kring scale path must stay exact at a POI cardinality where
    the broadcast cross-join would be the wrong plan (20k POIs, generated
    in-plan — no driver POI list ever exists)."""
    from socialmapper_spark.operators.knn import knn_join
    from socialmapper_spark.pipeline import geoparse_pages

    pois = spark.range(20000).select(
        F.concat(F.lit("poi"), F.col("id")).alias("id"),
        (F.lit(35.0) + F.pmod(F.xxhash64(F.col("id")), F.lit(100000)) / 100000.0).alias("lat"),
        (F.lit(-79.5) + F.pmod(F.xxhash64(F.col("id") + 7), F.lit(150000)) / 100000.0).alias("lon"),
    )
    probes = geoparse_pages(
        spark.read.parquet(f"{geo_small}/pages.parquet")
    ).filter(F.col("lat").isNotNull()).limit(300)
    a = {
        r["url"]: (r["poi_id"], round(r["distance_km"], 9))
        for r in knn_join(spark, probes, pois, k=1, strategy="kring").collect()
    }
    b = {
        r["url"]: (r["poi_id"], round(r["distance_km"], 9))
        for r in knn_join(spark, probes, pois, k=1, strategy="broadcast").collect()
    }
    assert a == b and len(a) == 300


def test_spatial_join_empty_polygon_table(spark, geo_small):
    """An empty polygon side must yield an empty result, not a crash."""
    from socialmapper_spark.operators.spatial_join import prepare_polygons, spatial_join
    from socialmapper_spark.pipeline import geoparse_pages

    polys = spark.read.parquet(f"{geo_small}/polygons.parquet").filter(F.lit(False))
    index = prepare_polygons(spark, polys)
    pts = geoparse_pages(spark.read.parquet(f"{geo_small}/pages.parquet")).filter(
        F.col("lat").isNotNull()
    )
    assert spatial_join(pts, index, cell="cell_r7").count() == 0
