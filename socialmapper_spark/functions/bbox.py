"""F4/F5/F6 — bbox + buffer helpers (region-query pruning primitives).

Reference:
- F4 km→degree buffer: ``buffer_deg = buffer_km / 111.0`` (the "~111 km
  per degree" approximation, isochrone/__init__.py:178-180).
- F5 bbox from POIs + buffer: min/max over valid coordinates expanded by
  the buffer (isochrone/__init__.py:160-186).
- F6 adaptive cluster buffer: ``buffer_km + travel_time/15 + n_pois/10``
  degrees-converted (clustering.py:203-221 ``get_network_bbox``).

Spark-first: all three are plain aggregates/column expressions. The
bboxes exist to PRUNE — a bbox row broadcast against a cell-indexed
table turns "pages near this POI cluster" into a range predicate the
parquet scan can push down.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KM_PER_DEG = 111.0  # isochrone/__init__.py:179 ("~111km per degree")


def buffer_km_to_deg(buffer_km: float) -> float:
    """F4 scalar twin (isochrone/__init__.py:178-180)."""
    return buffer_km / KM_PER_DEG


def poi_bounding_box(
    pois: DataFrame, buffer_km: float = 5.0, lat: str = "lat", lon: str = "lon"
) -> DataFrame:
    """F5: one-row (min_lat, min_lon, max_lat, max_lon) over valid
    coordinates, expanded by the km buffer — the reference's
    ``get_bounding_box`` (isochrone/__init__.py:160-186). Rows with NULL
    coordinates are skipped like the reference's None filter; an
    all-NULL input yields a NULL row (the caller's ValueError twin)."""
    bd = F.lit(buffer_km_to_deg(buffer_km))
    valid = pois.filter(F.col(lat).isNotNull() & F.col(lon).isNotNull())
    return valid.agg(
        (F.min(lat) - bd).alias("min_lat"),
        (F.min(lon) - bd).alias("min_lon"),
        (F.max(lat) + bd).alias("max_lat"),
        (F.max(lon) + bd).alias("max_lon"),
    )


def adaptive_buffer_deg(
    travel_time_minutes: Column, n_pois: Column, buffer_km: float = 2.0
) -> Column:
    """F6: the cluster-size/travel-time adaptive buffer in degrees
    (clustering.py:211-215)."""
    return (
        F.lit(buffer_km)
        + travel_time_minutes.cast("double") / F.lit(15.0)
        + n_pois.cast("double") / F.lit(10.0)
    ) / F.lit(KM_PER_DEG)


def cluster_network_bboxes(
    pois: DataFrame,
    cluster_col: str,
    travel_time_minutes: int = 15,
    buffer_km: float = 2.0,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """F6: per-cluster network-download bbox — min/max per cluster key
    expanded by the adaptive buffer (clustering.py:203-221). One hash
    aggregate on the cluster key; the result is a broadcast-sized prune
    table."""
    g = pois.filter(F.col(lat).isNotNull() & F.col(lon).isNotNull()).groupBy(
        cluster_col
    ).agg(
        F.count("*").alias("n_pois"),
        F.min(lat).alias("__lat0"),
        F.min(lon).alias("__lon0"),
        F.max(lat).alias("__lat1"),
        F.max(lon).alias("__lon1"),
    )
    bd = adaptive_buffer_deg(F.lit(travel_time_minutes), F.col("n_pois"), buffer_km)
    return g.select(
        cluster_col,
        "n_pois",
        (F.col("__lat0") - bd).alias("min_lat"),
        (F.col("__lon0") - bd).alias("min_lon"),
        (F.col("__lat1") + bd).alias("max_lat"),
        (F.col("__lon1") + bd).alias("max_lon"),
    )
