"""kNN join: nearest POI per point (SURVEY.md §2.3 J3, §2.6 T3/T4).

Reference semantics (/root/reference/socialmapper/distance/engine.py:54-109):
minimum **Euclidean distance in EPSG:5070 meters / 1000 → km** between
each probe point and the POI set, km→miles ×0.621371
(distance/__init__.py:176-178). The reference brute-forces O(n×m) with a
Numba kernel (or BallTree k=1); our scale path prunes candidates with the
cell k-ring before the exact distance.

Two strategies, same results (tested equal):

- ``strategy="broadcast"`` — exact brute force: crossJoin against the
  broadcast POI table, per-point top-k via min_by/window. Right answer
  for small POI sets (the reference never exceeds ~thousands); this is
  the parity baseline.
- ``strategy="kring"`` — scale path for large POI sets: POIs are
  expanded driver-side into all cells within RING k of their own cell;
  points equi-join that broadcast (cell → poi) table, compute exact
  distances on candidates only, take per-point top-k. Points with no
  candidate in k rings fall back to the broadcast path (exactness is
  never sacrificed — the ring prune is an optimization, not an
  approximation).

The Albers (x, y) of the probe side is computed by a vectorized Arrow
UDF (the only Python in this operator); POI coordinates are projected
driver-side with the same numpy function, so both sides use one
definition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from socialmapper_spark.geo.albers import albers5070_forward
from socialmapper_spark.geo.cells import cell_col, cell_np, cell_size_deg, grid_disk
from socialmapper_spark.functions.scalar import KM_TO_MILES

KNN_RES = 7  # candidate cell resolution (~2.2 km edge → ring 2 ≈ 5 km reach)


def _albers_udf():
    # built lazily: pandas_udf needs an active SparkSession to parse the
    # DDL return type, so module import must stay session-free
    @pandas_udf("struct<x:double,y:double>")
    def project(lat: pd.Series, lon: pd.Series) -> pd.DataFrame:
        x, y = albers5070_forward(
            lat.to_numpy(dtype=np.float64), lon.to_numpy(dtype=np.float64)
        )
        return pd.DataFrame({"x": x, "y": y})

    return project


def _poi_frame(spark: SparkSession, pois: DataFrame):
    rows = pois.select("id", "lat", "lon").collect()
    ids = [r["id"] for r in rows]
    plat = np.array([r["lat"] for r in rows], dtype=np.float64)
    plon = np.array([r["lon"] for r in rows], dtype=np.float64)
    px, py = albers5070_forward(plat, plon)
    return ids, plat, plon, px, py


def _auto_rings(px: np.ndarray, py: np.ndarray, plat: np.ndarray, k: int) -> int:
    """Ring radius sized from POI density so most probe points find ≥k
    candidates inside the disk (otherwise the exactness fallback brute-
    forces them and the prune buys nothing). Target reach ≈ 2× the radius
    of a circle expected to contain k POIs at the observed density; capped
    so the broadcast (cell → poi) table stays small."""
    n = len(px)
    area_km2 = max(
        (px.max() - px.min()) * (py.max() - py.min()) / 1e6, 1.0
    )
    density = n / area_km2  # pois per km²
    target_reach_km = 2.0 * float(np.sqrt(k / (np.pi * density)))
    edge_km = (
        cell_size_deg(KNN_RES) * 110.57 * float(np.cos(np.deg2rad(np.mean(np.abs(plat)))))
    )
    rings = int(np.ceil(target_reach_km / max(edge_km, 1e-6)))
    rings = max(1, min(rings, 16))
    # cap the broadcast at ~5M (cell, poi) rows
    while rings > 1 and n * (2 * rings + 1) ** 2 > 5_000_000:
        rings -= 1
    return rings


AUTO_BROADCAST_MAX_POIS = 10_000


def knn_join(
    spark: SparkSession,
    points: DataFrame,
    pois: DataFrame,
    k: int = 1,
    strategy: str = "broadcast",
    rings: int | None = None,
    id_col: str = "url",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Per-point k nearest POIs.

    Output: id_col, poi_id, distance_km, distance_miles, knn_rank
    (k=1 callers usually drop knn_rank). NULL-coordinate points drop out.

    ``strategy="auto"`` picks broadcast for POI sets up to
    AUTO_BROADCAST_MAX_POIS (the crossJoin+min(struct) plan beats the
    ring machinery when |POIs| candidates per point is already cheap) and
    the k-ring prune beyond that.
    """
    ids, plat, plon, px, py = _poi_frame(spark, pois)
    if strategy == "auto":
        strategy = "broadcast" if len(ids) <= AUTO_BROADCAST_MAX_POIS else "kring"
    poi_sdf = spark.createDataFrame(
        list(zip(ids, [float(v) for v in px], [float(v) for v in py])),
        "poi_id string, poi_x double, poi_y double",
    )

    pts = points.filter(F.col(lat).isNotNull() & F.col(lon).isNotNull())
    pts = pts.withColumn("__xy", _albers_udf()(F.col(lat), F.col(lon)))
    pts = pts.withColumn("__x", F.col("__xy.x")).withColumn("__y", F.col("__xy.y"))

    def finish(cand: DataFrame) -> DataFrame:
        # if the caller threaded a "__plat" passthrough column (kring guard),
        # carry it through the aggregation so no join back to pts is needed
        passthrough = "__plat" in cand.columns
        dx = cand["__x"] - cand["poi_x"]
        dy = cand["__y"] - cand["poi_y"]
        cand = cand.withColumn("distance_km", F.sqrt(dx * dx + dy * dy) / F.lit(1000.0))
        if k == 1:
            # top-1 as min(struct): partial aggregation combines map-side,
            # so the shuffle carries one row per point instead of one per
            # candidate — the difference between O(candidates) and
            # O(points) shuffle bytes at corpus scale. Struct comparison is
            # field-order lexicographic = (distance, poi_id) tie-break.
            aggs = [F.min(F.struct("distance_km", "poi_id")).alias("__best")]
            if passthrough:
                aggs.append(F.min("__plat").alias("__plat"))
            best = cand.groupBy(id_col).agg(*aggs)
            cols = [
                F.col(id_col),
                F.col("__best.poi_id").alias("poi_id"),
                F.col("__best.distance_km").alias("distance_km"),
                (F.col("__best.distance_km") * F.lit(KM_TO_MILES)).alias("distance_miles"),
                F.lit(1).alias("knn_rank"),
            ]
            if passthrough:
                cols.append(F.col("__plat"))
            return best.select(*cols)
        w = Window.partitionBy(id_col).orderBy(F.col("distance_km").asc(), F.col("poi_id").asc())
        out = (
            cand.withColumn("knn_rank", F.row_number().over(w))
            .filter(F.col("knn_rank") <= k)
            .withColumn("distance_miles", F.col("distance_km") * F.lit(KM_TO_MILES))
        )
        cols = [id_col, "poi_id", "distance_km", "distance_miles", "knn_rank"]
        if passthrough:
            cols.append("__plat")
        return out.select(*cols)

    if strategy == "broadcast":
        return finish(pts.crossJoin(F.broadcast(poi_sdf)))

    if strategy != "kring":
        raise ValueError(f"unknown strategy {strategy!r}")

    # --- k-ring candidate prune -------------------------------------------
    if rings is None:
        rings = _auto_rings(px, py, plat, k)
    poi_cells = cell_np(plat, plon, KNN_RES)
    cell_rows = []
    for pid, c in zip(ids, poi_cells):
        for cc in grid_disk(int(c), rings):
            cell_rows.append((cc, pid))
    cells_df = spark.createDataFrame(cell_rows, "cell long, poi_id string").join(
        poi_sdf, "poi_id"
    )

    # pts feeds two consumers (candidate join + the fallback anti-join);
    # persist so the upstream plan (incl. the Arrow projection UDF) runs
    # once. At cluster scale this is the stage-boundary materialization of
    # the projected probe side.
    pts = pts.persist()
    pts_c = pts.withColumn("__cell", cell_col(F.col(lat), F.col(lon), KNN_RES)).withColumn(
        "__plat", F.col(lat)
    )
    cand = pts_c.join(F.broadcast(cells_df), pts_c["__cell"] == cells_df["cell"], "inner")
    # `near` feeds three consumers (stats, covered, the anti-join) — persist
    # so the candidate join + window execute once. At cluster scale this is
    # a spill-safe MEMORY_AND_DISK of the already-pruned candidate top-k,
    # which is ~|points|·k rows, far smaller than the raw candidate set.
    # The point latitude is threaded through the aggregation ("__plat"
    # passthrough in finish), so the exactness guard below is a per-row
    # filter on `near` itself — no join back to pts.
    near = finish(cand).persist()

    # exactness guard: the ring prune is only provably exact when the k-th
    # candidate distance is smaller than the minimum possible distance to
    # any POI OUTSIDE the ring box. A point at its cell edge is ≥
    # rings·cell_edge degrees (in the constraining axis) from any
    # non-candidate POI; convert to meters conservatively (shrunken
    # meters-per-degree, 10% safety margin for Albers distortion).
    edge = cell_size_deg(KNN_RES)
    bound_m = (
        F.lit(rings * edge * 110000.0 * 0.9)
        * F.cos(F.radians(F.least(F.abs(F.col("__plat")) + F.lit(1.0), F.lit(89.0))))
    )
    stats = near.groupBy(id_col).agg(
        F.count("*").alias("__n"),
        F.max("distance_km").alias("__dk"),
        F.min("__plat").alias("__plat"),
    )
    proven = stats.filter(
        (F.col("__n") >= k) & (F.col("__dk") * 1000.0 <= bound_m)
    ).select(id_col)
    covered = near.drop("__plat").join(proven, id_col, "left_semi")
    missing = pts.join(proven, id_col, "left_anti")
    fallback = finish(missing.crossJoin(F.broadcast(poi_sdf)))
    return covered.unionByName(fallback)
