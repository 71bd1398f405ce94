"""S6 — ZCTA (ZIP Code Tabulation Area) geographic level.

Reference: socialmapper/census/services/zcta_service.py. The reference
fetches ZCTA boundaries from the TIGERweb REST API, selecting by the
postal-prefix patterns of the requested state (``state_zcta_prefixes``,
zcta_service.py:65-73), then cleanses ZCTA-level census values with the
same sentinel rules as block groups (zcta_service.py:352-359 — shared
here via :func:`~socialmapper_spark.functions.scalar.cleanse_census_value`).

In the engine the boundary "fetch" is a filter over the static polygon
table (kind = 'zcta'), which Catalyst pushes into the parquet scan — the
prefix LIKEs and the kind equality both reach ``PushedFilters``, so at a
nationwide table only the requested state's row groups are read.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# state FIPS → ZCTA postal prefixes — EXACT map from zcta_service.py:65-73
STATE_ZCTA_PREFIXES: dict[str, list[str]] = {
    "37": ["27", "28"],  # North Carolina
    "45": ["29"],  # South Carolina
    "13": ["30", "31"],  # Georgia
    "51": ["22", "23", "24"],  # Virginia
    "06": ["90", "91", "92", "93", "94", "95", "96"],  # California
    "36": ["10", "11", "12", "13", "14"],  # New York
    "48": ["75", "76", "77", "78", "79"],  # Texas
}


def zcta_prefixes_for_state(state_fips: str) -> list[str]:
    """Prefixes for a state FIPS (zero-padded like the reference, :48).

    Raises ValueError for unmapped states — reference behavior
    (zcta_service.py:79-81).
    """
    state_fips = state_fips.zfill(2)
    prefixes = STATE_ZCTA_PREFIXES.get(state_fips, [])
    if not prefixes:
        raise ValueError(f"No ZCTA prefix mapping available for state {state_fips}")
    return prefixes


def zcta_prefix_predicate(geoid: Column, state_fips: str) -> Column:
    """OR of startswith(prefix) — pure Catalyst, pushes down as LIKEs."""
    return reduce(
        lambda a, b: a | b,
        (geoid.startswith(p) for p in zcta_prefixes_for_state(state_fips)),
    )


def zctas_for_state(polygons: DataFrame, state_fips: str) -> DataFrame:
    """The engine twin of ``get_zctas_for_state`` (zcta_service.py:38-169):
    prefix-selected ZCTA boundary rows from the static polygon table."""
    return polygons.filter(
        (F.col("kind") == "zcta")
        & zcta_prefix_predicate(F.col("GEOID"), state_fips)
    )
