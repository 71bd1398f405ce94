"""Two-phase point-in-polygon spatial join (SURVEY.md §2.3 J1/J2).

Reference semantics: a page/POI belongs to every polygon containing its
coordinates — the reference outsources this to the Census geocoder web
API for points (/root/reference/socialmapper/census/infrastructure/
geocoder.py:41-83) and uses GeoPandas ``.intersects`` for the isochrone ∩
block-group join (/root/reference/socialmapper/pipeline/census.py:88).
Our engine computes both locally with one plan shape:

  phase 0 (prep, distributed): the polygon table is optionally
      simplified (F9 Douglas-Peucker, reference
      spatial_block_group_service.py:89-90) and its cell cover computed
      by a ``mapInPandas`` over the polygons DataFrame — per-polygon
      numpy work on executors, never a driver-side geometry loop, so a
      nationwide 240k-block-group table preps in parallel. The cover
      wraps the *polygon* (edge supercover + interior centers), not its
      bbox, so long diagonal isochrone hulls don't inflate candidates.
  phase 1 (prefilter, JVM-side): equi-join points to the broadcast
      (cell → poly_id) table on the cell id at PREFILTER_RES. The cover
      OVER-approximates each polygon (no false negatives; O3 in
      SURVEY.md §4), so phase 1 is a pure broadcast hash join that
      Catalyst keeps inside whole-stage codegen.
  phase 2 (exact refine, pure Catalyst): candidates pick up their
      polygon's pre-parsed edge list via a second *broadcast hash join*
      on poly_id — geometry reaches executors through Spark's own
      BroadcastExchange, no driver collect, no SparkContext.broadcast
      pickle — and the even-odd ray cast runs as an ``F.aggregate`` XOR
      over the edges array, entirely JVM-side. No Python workers, no
      Arrow transfer, no per-candidate geometry bytes shipped out of the
      JVM: the hot path satisfies the "zero per-row Python" mandate
      literally. The crossing test is the same expression as the numpy
      twin (geo/pip.py), so results are bit-identical. Even-odd over the
      flattened ring set equals the per-member exterior-minus-holes rule
      for standard geometries (disjoint members, holes nested in their
      exterior) — the only shapes the WKB codec emits.

Scale notes (100 TB design point): the points side is never shuffled —
phase 1/2 are broadcast joins, the refine is a narrow map. Output
partitioning is inherited from the scan, so callers that aggregate by
polygon afterwards shuffle only the (much smaller) matched rows.
Hot-cell skew does not matter for the join itself (no shuffle); it
matters for downstream aggregations, which salt on cell keys (see
pipeline.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from socialmapper_spark.geo.cells import cell_col, polygon_cover_cells
from socialmapper_spark.geo.simplify import simplify_polygon
from socialmapper_spark.geo.wkb import polygon_to_wkb, wkb_to_rings

PREFILTER_RES = 7


@dataclass
class PolygonIndex:
    """Distributed-prepared state for one polygon table.

    cells_df: (cell:long, poly_id:string) over-approximate polygon cover
    geoms_df: (poly_id:string, __edges:array<struct x1,y1,x2,y2>) —
              pre-parsed (optionally simplified) ring edges, shipped to
              the JVM-side refine via a broadcast hash join
    meta_df:  original polygon attributes minus geometry (join-back side)
    """

    cells_df: DataFrame
    geoms_df: DataFrame
    meta_df: DataFrame


_EDGES_SCHEMA = (
    "poly_id string, "
    "__edges array<struct<x1:double,y1:double,x2:double,y2:double>>"
)


def _edge_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """WKB → flattened closed-ring edge list (all members, all rings)."""
    for pdf in batches:
        rows = []
        for pid, b in zip(pdf["poly_id"], pdf["geometry_wkb"]):
            edges = []
            for rings in wkb_to_rings(bytes(b)):
                for ring in rings:
                    ring = np.asarray(ring, dtype=np.float64)
                    if np.array_equal(ring[0], ring[-1]):
                        ring = ring[:-1]
                    nxt = np.roll(ring, -1, axis=0)
                    edges.extend(
                        {"x1": float(a[0]), "y1": float(a[1]),
                         "x2": float(c[0]), "y2": float(c[1])}
                        for a, c in zip(ring, nxt)
                    )
            rows.append((pid, edges))
        yield pd.DataFrame(rows, columns=["poly_id", "__edges"])


def _simplify_batches(tol: float):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            wkbs = [
                polygon_to_wkb_multi(
                    [simplify_polygon(rings, tol) for rings in wkb_to_rings(bytes(b))]
                )
                for b in pdf["geometry_wkb"]
            ]
            yield pd.DataFrame({"poly_id": pdf["poly_id"], "geometry_wkb": wkbs})

    return run


def polygon_to_wkb_multi(polys: list[list[np.ndarray]]) -> bytes:
    """Members → WKB (Polygon when single, MultiPolygon otherwise)."""
    import struct

    if len(polys) == 1:
        return polygon_to_wkb(polys[0])
    parts = [struct.pack("<BII", 1, 6, len(polys))]
    parts += [polygon_to_wkb(rings) for rings in polys]
    return b"".join(parts)


def _cover_batches(res: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pids: list[str] = []
            cells: list[np.ndarray] = []
            for pid, b in zip(pdf["poly_id"], pdf["geometry_wkb"]):
                cc = polygon_cover_cells(wkb_to_rings(bytes(b)), res)
                pids.extend([pid] * len(cc))
                cells.append(cc)
            yield pd.DataFrame(
                {
                    "cell": np.concatenate(cells) if cells else np.array([], np.int64),
                    "poly_id": pids,
                }
            )

    return run


def prepare_polygons(
    spark: SparkSession,
    polygons: DataFrame,
    res: int = PREFILTER_RES,
    simplify_tolerance_deg: float = 0.0,
) -> PolygonIndex:
    """Build the polygon-side index — entirely inside the Spark plan.

    Mirrors the reference's one-time polygon prep (simplify + spatial
    index, spatial_block_group_service.py:83-94), but distributed: both
    the optional F9 simplify and the cell-cover explode run as
    ``mapInPandas`` over the polygons DataFrame, so no geometry is ever
    collected to the driver. ``simplify_tolerance_deg`` defaults to 0
    (exact geometry — required when results must match an exact oracle);
    the reference's 100 m is ≈0.001°.
    """
    geom = polygons.select("poly_id", "geometry_wkb")
    if simplify_tolerance_deg > 0.0:
        geom = geom.mapInPandas(
            _simplify_batches(simplify_tolerance_deg),
            "poly_id string, geometry_wkb binary",
        ).persist()  # two consumers (cover + edges); avoid re-simplify
    cells_df = geom.mapInPandas(_cover_batches(res), "cell long, poly_id string")
    geoms_df = geom.mapInPandas(_edge_batches, _EDGES_SCHEMA)
    meta_df = polygons.drop("geometry_wkb")
    return PolygonIndex(cells_df=cells_df, geoms_df=geoms_df, meta_df=meta_df)


def pip_refine_expr(edges: F.Column, lon: F.Column, lat: F.Column) -> F.Column:
    """Even-odd ray cast as a pure Catalyst fold over the edge array.

    The crossing test is the EXACT expression of the numpy twin
    (geo/pip.py points_in_ring): an edge crosses when
    ``(y1 > py) != (y2 > py)`` and the x-intersection is strictly right
    of the point. IEEE double ops in the same order → bit-identical
    verdicts. The division is guarded by the crossing condition (y1 ≠ y2
    whenever it holds); when it doesn't, the NaN/Inf x-intersection is
    inside a conjunction that is already false.
    """
    return F.aggregate(
        edges,
        F.lit(False),
        lambda acc, e: F.when(
            ((e["y1"] > lat) != (e["y2"] > lat))
            & (
                lon
                < (e["x2"] - e["x1"]) * (lat - e["y1"]) / (e["y2"] - e["y1"])
                + e["x1"]
            ),
            ~acc,
        ).otherwise(acc),
    )


def _make_geom_valid_udf():
    @pandas_udf("boolean")
    def geom_valid(wkb: pd.Series) -> pd.Series:
        out = np.zeros(len(wkb), dtype=bool)
        for i, b in enumerate(wkb):
            if b is None:
                continue
            try:
                polys = wkb_to_rings(bytes(b))
            except Exception:  # malformed WKB: struct errors, bad lengths
                continue
            ok = len(polys) > 0
            for rings in polys:
                if not rings or rings[0].shape[0] < 3:
                    ok = False
                    break
                if not all(np.isfinite(r).all() for r in rings):
                    ok = False
                    break
            out[i] = ok
        return pd.Series(out)

    return geom_valid


def validate_geometries(
    polygons: DataFrame, geometry_col: str = "geometry_wkb"
) -> tuple[DataFrame, DataFrame]:
    """P4 — (valid, quarantined-invalid) split of a polygon table.

    Reference drops null/invalid geometries before the spatial join
    (block_group_service.py:230-236 ``geometry.notna() & geometry.is_valid``,
    same in zcta_service.py:246-252). Without GEOS, 'valid' here means:
    non-null, parseable WKB, every member polygon has a ≥3-vertex exterior,
    and all coordinates finite — the failure modes that would crash or
    silently mis-assign ``wkb_to_rings``/ray-casting downstream. Invalid
    rows are *returned*, not dropped silently (the quarantine convention
    of P1 coordinate validation).
    """
    ok = _make_geom_valid_udf()(F.col(geometry_col))
    return polygons.filter(ok), polygons.filter(~ok)


def add_cells(df: DataFrame, lat="lat", lon="lon", resolutions=(7, 8, 9)) -> DataFrame:
    """Attach cell_r{res} columns (pure Catalyst, NULL-safe)."""
    for r in resolutions:
        df = df.withColumn(f"cell_r{r}", cell_col(F.col(lat), F.col(lon), r))
    return df


def spatial_join(
    points: DataFrame,
    index: PolygonIndex,
    lat: str = "lat",
    lon: str = "lon",
    cell: str | None = None,
) -> DataFrame:
    """points ⨝ polygons (containment). Returns points columns + poly_id.

    Points with NULL coordinates drop out (no candidate cells), matching
    the reference's required-field predicate (extraction.py:68-74).
    """
    if cell is None:
        points = points.withColumn(
            "__cell", cell_col(F.col(lat), F.col(lon), PREFILTER_RES)
        )
        cell = "__cell"
    candidates = (
        points.join(
            F.broadcast(index.cells_df), points[cell] == index.cells_df["cell"], "inner"
        )
        .drop("cell")
        .join(F.broadcast(index.geoms_df), "poly_id")
    )
    out = candidates.filter(
        pip_refine_expr(F.col("__edges"), F.col(lon), F.col(lat))
    ).drop("__edges")
    return out.drop("__cell") if "__cell" in out.columns else out
