from socialmapper_spark.functions.scalar import (  # noqa: F401
    CENSUS_SENTINELS,
    STATE_BOUNDS,
    cleanse_census_value,
    geoid_build,
    geoid_split,
    haversine_km,
    km_to_miles,
    planar_distance_km,
    state_bounds_filter,
)
from socialmapper_spark.functions.text import (  # noqa: F401
    doc_fingerprint,
    language_id,
    quality_score_cols,
    token_count,
)
