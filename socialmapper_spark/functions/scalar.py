"""Scalar column-expression functions (SURVEY.md §2.8) — all pure Catalyst.

Each function reproduces a reference semantic exactly (file:line cited per
function); none uses a UDF, so all stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0  # reference: socialmapper/isochrone/clustering.py:199
KM_TO_MILES = 0.621371    # reference: socialmapper/distance/__init__.py:176-178

# Census placeholder sentinels — EXACT list from
# socialmapper/census/services/census_service.py:262 (string-typed in the
# reference because the Census API returns strings; numeric twins here).
CENSUS_SENTINELS = [
    -999999999.0,
    -888888888.0,
    -666666666.0,
    -555555555.0,
    -222222222.0,
    -111111111.0,
]

# Per-state bounding boxes — socialmapper/query/__init__.py:222-231.
STATE_BOUNDS: dict[str, dict[str, float]] = {
    "NC": {"min_lat": 33.7, "max_lat": 36.6, "min_lon": -84.4, "max_lon": -75.3},
    "CA": {"min_lat": 32.5, "max_lat": 42.0, "min_lon": -124.5, "max_lon": -114.0},
    "NH": {"min_lat": 42.7, "max_lat": 45.3, "min_lon": -72.6, "max_lon": -70.6},
    "CT": {"min_lat": 40.9, "max_lat": 42.1, "min_lon": -73.8, "max_lon": -71.8},
}


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle km — formula of socialmapper/isochrone/clustering.py:185-201."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def planar_distance_km(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """Euclidean meters→km in a projected CRS — socialmapper/distance/engine.py:76-84."""
    dx, dy = x2 - x1, y2 - y1
    return F.sqrt(dx * dx + dy * dy) / F.lit(1000.0)


def km_to_miles(km: Column) -> Column:
    """socialmapper/distance/__init__.py:176-178."""
    return km * F.lit(KM_TO_MILES)


def geoid_build(state: Column, county: Column, tract: Column, blkgrp: Column) -> Column:
    """Zero-padded 12-char block-group GEOID —
    socialmapper/census/services/census_service.py:294-307."""
    return F.concat(
        F.lpad(state.cast("string"), 2, "0"),
        F.lpad(county.cast("string"), 3, "0"),
        F.lpad(tract.cast("string"), 6, "0"),
        F.lpad(blkgrp.cast("string"), 1, "0"),
    )


def geoid_split(geoid: Column) -> dict[str, Column]:
    """GEOID → components — socialmapper/export/preparation.py:17-69."""
    return {
        "state_fips": F.substring(geoid, 1, 2),
        "county_fips": F.substring(geoid, 3, 3),
        "tract": F.substring(geoid, 6, 6),
        "block_group": F.substring(geoid, 12, 1),
    }


def cleanse_census_value(variable_code: Column, value: Column) -> Column:
    """Sentinel→NULL cleansing, EXACT parity with
    socialmapper/census/services/census_service.py:262-278 (P3):

    - sentinel constants → NULL
    - B19*/B25* (income/financial) with value < 0 → NULL
    - any variable with value < -100000 → NULL
    """
    is_sentinel = value.isin(CENSUS_SENTINELS)
    is_financial = variable_code.startswith("B19") | variable_code.startswith("B25")
    return (
        F.when(value.isNull() | is_sentinel, F.lit(None).cast("double"))
        .when(is_financial & (value < 0), F.lit(None).cast("double"))
        .when(value < -100000, F.lit(None).cast("double"))
        .otherwise(value.cast("double"))
    )


def state_bounds_filter(df: DataFrame, state: str, lat="lat", lon="lon") -> DataFrame:
    """Drop rows outside the state's hard-coded bbox —
    socialmapper/query/__init__.py:243-246 (S2/F14). Unknown state → no-op,
    matching the reference ('Check if we should filter by bounds')."""
    b = STATE_BOUNDS.get(state)
    if b is None:
        return df
    return df.filter(
        (F.col(lat) >= b["min_lat"])
        & (F.col(lat) <= b["max_lat"])
        & (F.col(lon) >= b["min_lon"])
        & (F.col(lon) <= b["max_lon"])
    )


def validate_coordinates(df: DataFrame, lat="lat", lon="lon") -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined-invalid) split —
    socialmapper/util/coordinate_validation.py:27-56 (P1). Invalid rows are
    returned, not dropped silently (the reference tracks them via
    util/invalid_data_tracker.py)."""
    ok = (
        F.col(lat).isNotNull()
        & F.col(lon).isNotNull()
        & (F.col(lat) >= -90.0) & (F.col(lat) <= 90.0)
        & (F.col(lon) >= -180.0) & (F.col(lon) <= 180.0)
    )
    return df.filter(ok), df.filter(~F.coalesce(ok, F.lit(False)))
