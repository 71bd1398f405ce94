"""Two-phase point-in-polygon spatial join (SURVEY.md §2.3 J1/J2).

Reference semantics: a page/POI belongs to every polygon containing its
coordinates — the reference outsources this to the Census geocoder web
API for points (/root/reference/socialmapper/census/infrastructure/
geocoder.py:41-83) and uses GeoPandas ``.intersects`` for the isochrone ∩
block-group join (/root/reference/socialmapper/pipeline/census.py:88).
Our engine computes both locally with one plan shape:

  phase 1 (prefilter, JVM-side): equi-join points to a broadcast
      (cell → poly_id) table on the cell id at PREFILTER_RES. The cell
      cover OVER-approximates each polygon (no false negatives; O3 in
      SURVEY.md §4), so phase 1 is a pure broadcast hash join that
      Catalyst keeps inside whole-stage codegen.
  phase 2 (exact refine, vectorized Python): a pandas UDF evaluates
      ray-casting PIP per candidate against the polygon's rings, grouping
      each Arrow batch by poly_id so the numpy kernel runs vectorized
      over points (the big side). Polygon geometry reaches executors via
      a TorrentBroadcast dict — one copy per executor, never reshuffled.

Scale notes (100 TB design point): the points side is never shuffled —
phase 1 is broadcast, phase 2 is a narrow map. Output partitioning is
inherited from the scan, so callers that aggregate by polygon afterwards
shuffle only the (much smaller) matched rows. Hot-cell skew does not
matter for the join itself (no shuffle); it matters for downstream
aggregations, which salt on cell keys (see pipeline.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from socialmapper_spark.geo.cells import cell_col, covering_cells
from socialmapper_spark.geo.pip import points_in_polygon
from socialmapper_spark.geo.wkb import wkb_to_rings

PREFILTER_RES = 7


@dataclass
class PolygonIndex:
    """Driver-prepared broadcast state for one polygon table.

    cells_df: (cell:long, poly_id:string) over-approximate cover
    geoms:    SparkContext broadcast of {poly_id: [rings...]}
    meta_df:  original polygon attributes minus geometry (join-back side)
    """

    cells_df: DataFrame
    geoms: object  # pyspark Broadcast[dict[str, list[np.ndarray]]]
    meta_df: DataFrame


def prepare_polygons(
    spark: SparkSession, polygons: DataFrame, res: int = PREFILTER_RES
) -> PolygonIndex:
    """Collect the (small, broadcastable) polygon side and build the index.

    Mirrors the reference's one-time polygon prep (simplify + spatial
    index, spatial_block_group_service.py:83-94) — done once on the
    driver, shipped to executors as a broadcast.
    """
    rows = polygons.select("poly_id", "geometry_wkb").collect()
    geom_map: dict[str, list[np.ndarray]] = {}
    cell_rows: list[tuple[int, str]] = []
    for r in rows:
        polys = wkb_to_rings(bytes(r["geometry_wkb"]))
        # flatten MultiPolygon members into one ring list per poly_id;
        # PIP over multiple exteriors = OR, handled by per-member test
        geom_map[r["poly_id"]] = polys
        seen = set()
        for rings in polys:
            for c in covering_cells(rings, res):
                if c not in seen:
                    seen.add(c)
                    cell_rows.append((c, r["poly_id"]))
    cells_df = spark.createDataFrame(cell_rows, "cell long, poly_id string")
    geoms = spark.sparkContext.broadcast(geom_map)
    meta_df = polygons.drop("geometry_wkb")
    return PolygonIndex(cells_df=cells_df, geoms=geoms, meta_df=meta_df)


def _make_refine_udf(geoms_bc):
    @pandas_udf("boolean")
    def pip_refine(poly_id: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
        out = np.zeros(len(poly_id), dtype=bool)
        px = lon.to_numpy(dtype=np.float64)
        py = lat.to_numpy(dtype=np.float64)
        gm = geoms_bc.value
        # group the Arrow batch by polygon so the ray-cast kernel runs
        # vectorized over all of that polygon's candidate points
        for pid, idx in poly_id.groupby(poly_id).groups.items():
            polys = gm.get(pid)
            if polys is None:
                continue
            ii = np.asarray(idx)
            hit = np.zeros(len(ii), dtype=bool)
            for rings in polys:
                hit |= points_in_polygon(px[ii], py[ii], rings)
            out[ii] = hit
        return pd.Series(out)

    return pip_refine


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
    refine = _make_refine_udf(index.geoms)
    candidates = points.join(
        F.broadcast(index.cells_df), points[cell] == index.cells_df["cell"], "inner"
    ).drop("cell")
    out = candidates.filter(refine(F.col("poly_id"), F.col(lon), F.col(lat)))
    return out.drop("__cell") if "__cell" in out.columns else out
