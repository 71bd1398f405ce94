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
  expanded *inside the plan* into all cells within RING k of their own
  cell (pure-Catalyst ``grid_disk_col`` explode — no driver loop, so a
  million-POI table expands distributed); points equi-join that
  broadcast (cell → poi) table, compute exact distances on candidates
  only, take per-point top-k. Points with no candidate in k rings fall
  back to the broadcast path (exactness is never sacrificed — the ring
  prune is an optimization, not an approximation).

Both sides' Albers (x, y) are computed by the same vectorized Arrow UDF
(the only Python in this operator) — one definition, applied in-plan, so
no coordinate ever round-trips through the driver. The only driver-side
work is a one-row stats aggregate over the (small) POI table that sizes
the ring radius.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from socialmapper_spark.geo.albers import albers5070_forward
from socialmapper_spark.geo.cells import cell_col, cell_size_deg, grid_disk_col
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


def _poi_stats(poi_sdf: DataFrame) -> tuple[int, float, float]:
    """One-row aggregate over the (small) POI side: count, bbox area in
    km², mean |lat|. The only POI information that ever reaches the
    driver — used to size the ring radius, never the geometry itself."""
    r = poi_sdf.agg(
        F.count("*").alias("n"),
        ((F.max("poi_x") - F.min("poi_x")) * (F.max("poi_y") - F.min("poi_y")) / 1e6).alias("area"),
        F.avg(F.abs("__poi_lat")).alias("alat"),
    ).collect()[0]
    return int(r["n"]), max(float(r["area"] or 0.0), 1.0), float(r["alat"] or 0.0)


def _auto_rings(n: int, area_km2: float, mean_abs_lat: float, k: int) -> int:
    """Ring radius sized from POI density so most probe points find ≥k
    candidates inside the disk (otherwise the exactness fallback brute-
    forces them and the prune buys nothing). Target reach ≈ 2× the radius
    of a circle expected to contain k POIs at the observed density; capped
    so the broadcast (cell → poi) table stays small."""
    density = n / area_km2  # pois per km²
    target_reach_km = 2.0 * float(np.sqrt(k / (np.pi * density)))
    edge_km = (
        cell_size_deg(KNN_RES) * 110.57 * float(np.cos(np.deg2rad(mean_abs_lat)))
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
    proj = _albers_udf()
    poi_sdf = (
        pois.select(
            F.col("id").alias("poi_id"),
            F.col("lat").alias("__poi_lat"),
            F.col("lon").alias("__poi_lon"),
        )
        .withColumn("__pxy", proj(F.col("__poi_lat"), F.col("__poi_lon")))
        .select(
            "poi_id",
            F.col("__pxy.x").alias("poi_x"),
            F.col("__pxy.y").alias("poi_y"),
            "__poi_lat",
            "__poi_lon",
        )
    )
    n_pois = area_km2 = mean_abs_lat = None
    if strategy in ("auto", "kring"):
        # the kring path consumes poi_sdf at least twice (ring explode +
        # fallback broadcast, plus the stats agg when rings is auto) —
        # persist so the POI scan + Arrow projection run once
        poi_sdf = poi_sdf.persist()
    poi_xy = poi_sdf.select("poi_id", "poi_x", "poi_y")
    if strategy == "auto" or (strategy == "kring" and rings is None):
        # the one driver-side action on the POI side: a 1-row stats agg
        n_pois, area_km2, mean_abs_lat = _poi_stats(poi_sdf)
    if strategy == "auto":
        strategy = "broadcast" if n_pois <= AUTO_BROADCAST_MAX_POIS else "kring"
    if strategy == "kring" and rings is None:
        # density-adaptive degrade: _auto_rings targets a reach holding
        # ~4k POIs, but its caps (ring radius ≤ 16, broadcast rows ≤ 5M)
        # can leave the actual reach far short on a sparse POI table. If
        # the expected POI count inside the capped, guard-provable disk is
        # < 2k, the exactness guard will fail for most points and nearly
        # the whole probe side rides the brute-force fallback — the ring
        # machinery (explode, candidate join, stats, semi+anti joins)
        # becomes pure overhead on top of the crossJoin it was meant to
        # avoid. Emitting the broadcast plan directly is then the better
        # physical strategy for the SAME exact semantics (cost-based
        # selection, not an approximation). Dense corpora — the 100 TB
        # design point where pruning pays — keep the true kring plan, as
        # does any caller pinning `rings` explicitly.
        rings = _auto_rings(n_pois, area_km2, mean_abs_lat, k)
        edge_km = (
            cell_size_deg(KNN_RES) * 110.57 * float(np.cos(np.deg2rad(mean_abs_lat)))
        )
        provable_reach_km = rings * edge_km * 0.9  # the guard's own margin
        expected_in_reach = n_pois / area_km2 * np.pi * provable_reach_km**2
        if expected_in_reach < 2.0 * k:
            strategy = "broadcast"

    # prune to the three columns the join needs BEFORE the Arrow
    # projection: the probe side often carries wide payload columns
    # (mentions arrays, text) that would otherwise ride through the
    # UDF, the persist, and every shuffle of the kring machinery
    pts = points.filter(F.col(lat).isNotNull() & F.col(lon).isNotNull()).select(
        id_col, lat, lon
    )
    pts = pts.withColumn("__xy", _albers_udf()(F.col(lat), F.col(lon)))
    pts = pts.withColumn("__x", F.col("__xy.x")).withColumn("__y", F.col("__xy.y"))

    def finish(cand: DataFrame, keep_xy: bool = False) -> DataFrame:
        # if the caller threaded a "__plat" passthrough column (kring guard),
        # carry it through the aggregation so no join back to pts is needed;
        # keep_xy additionally threads the probe's own projected coordinates
        # through, so the guard-failed rows can feed the brute-force fallback
        # directly — no join back to the probe side at all
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
            # With a LEFT candidate join a group holds either only real
            # candidates or exactly ONE all-null row (left join emits the
            # null row only on zero matches), so min(struct) never mixes
            # null and real distances — a null distance_km in the output
            # means "no candidate in the rings", the fallback marker.
            aggs = [F.min(F.struct("distance_km", "poi_id")).alias("__best")]
            if passthrough:
                aggs.append(F.min("__plat").alias("__plat"))
            if keep_xy:
                aggs.extend([F.min("__x").alias("__x"), F.min("__y").alias("__y")])
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
            if keep_xy:
                cols.extend([F.col("__x"), F.col("__y")])
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
        if keep_xy:
            cols.extend(["__x", "__y"])
        return out.select(*cols)

    if strategy == "broadcast":
        out = finish(pts.crossJoin(F.broadcast(poi_xy)))
        if poi_sdf.is_cached:  # auto/degraded entry persisted the POI side
            out.__spark_graft_caches__ = [poi_sdf]
        return out

    if strategy != "kring":
        raise ValueError(f"unknown strategy {strategy!r}")

    # --- k-ring candidate prune -------------------------------------------
    if rings is None:
        rings = _auto_rings(n_pois, area_km2, mean_abs_lat, k)
    # expand each POI into its ring disk *inside the plan*: pure-Catalyst
    # array build + explode, distributed over the POI table's partitions —
    # no driver loop proportional to |POIs|·rings²
    cells_df = poi_sdf.withColumn(
        "__pcell", cell_col(F.col("__poi_lat"), F.col("__poi_lon"), KNN_RES)
    ).select(
        "poi_id",
        "poi_x",
        "poi_y",
        F.explode(grid_disk_col(F.col("__pcell"), KNN_RES, rings)).alias("cell"),
    )

    # LEFT candidate join: points with no POI in their ring disk survive
    # with an all-null candidate row instead of disappearing. That single
    # change removes the two heaviest pieces of the old fallback plumbing —
    # the probe side is consumed exactly ONCE (no pts.persist needed: the
    # Arrow projection runs a single time inside this join's stage) and the
    # fallback set falls out of `near` itself (no left-anti shuffle back
    # against the full probe table). The probe's own projected (__x, __y)
    # are threaded through the aggregation (keep_xy) so fallback rows carry
    # their coordinates with them.
    pts_c = pts.withColumn("__cell", cell_col(F.col(lat), F.col(lon), KNN_RES)).withColumn(
        "__plat", F.col(lat)
    )
    cand = pts_c.join(F.broadcast(cells_df), pts_c["__cell"] == cells_df["cell"], "left")
    # `near` feeds two consumers (covered + fallback split) — persist so the
    # candidate join + top-k execute once. At cluster scale this is a
    # spill-safe MEMORY_AND_DISK of the already-pruned candidate top-k,
    # ~|points|·k rows, far smaller than the raw candidate set.
    near = finish(cand, keep_xy=True).persist()

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
    out_cols = [id_col, "poi_id", "distance_km", "distance_miles", "knn_rank"]
    if k == 1:
        # top-1 fast path: `near` holds exactly one row per point, so the
        # guard is a NARROW per-row filter — null distance (no candidate)
        # makes `ok` false, not null, because isNotNull anchors the AND
        ok = F.col("distance_km").isNotNull() & (
            F.col("distance_km") * 1000.0 <= bound_m
        )
        covered = near.filter(ok).select(*out_cols)
        fb_pts = near.filter(~ok).select(id_col, "__x", "__y")
    else:
        stats = near.groupBy(id_col).agg(
            F.count("poi_id").alias("__n"),  # count(col) skips the null row
            F.max("distance_km").alias("__dk"),
            F.min("__plat").alias("__plat"),
            F.min("__x").alias("__x"),
            F.min("__y").alias("__y"),
        )
        # fallback condition spelled null-safe: a candidate-less point has
        # __n = 0 (count of nulls) and null __dk
        fb = (F.col("__n") < k) | F.col("__dk").isNull() | (
            F.col("__dk") * 1000.0 > bound_m
        )
        missing = stats.filter(fb).select(id_col, "__x", "__y")
        covered = (
            near.filter(F.col("poi_id").isNotNull())
            .join(missing.select(id_col), id_col, "left_anti")
            .select(*out_cols)
        )
        fb_pts = missing
    fallback = finish(fb_pts.crossJoin(F.broadcast(poi_xy)))
    out = covered.unionByName(fallback)
    # the persists above are consumed lazily by this returned plan, so the
    # operator cannot unpersist them itself; hand the caller the handles
    # (session.release_caches) for release after its terminal action
    out.__spark_graft_caches__ = [poi_sdf, near]
    return out
