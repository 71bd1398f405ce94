from socialmapper_spark.operators.spatial_join import (  # noqa: F401
    PolygonIndex,
    add_cells,
    spatial_join,
)
from socialmapper_spark.operators.knn import knn_join  # noqa: F401
from socialmapper_spark.operators.events import (  # noqa: F401
    sessionize,
    window_rollup,
    window_rollup_stream,
)
from socialmapper_spark.operators.stats import (  # noqa: F401
    cluster_metrics,
    geoid_prefix_groups,
    isochrone_area,
    null_rate_stats,
    polygon_area_km2,
    quantile_bins,
)
from socialmapper_spark.operators.census import (  # noqa: F401
    demographic_summary,
    dedup_units,
    pivot_census,
)
