from socialmapper_spark.operators.spatial_join import (  # noqa: F401
    PolygonIndex,
    add_cells,
    spatial_join,
)
from socialmapper_spark.operators.knn import knn_join  # noqa: F401
from socialmapper_spark.operators.census import (  # noqa: F401
    demographic_summary,
    dedup_units,
    pivot_census,
)
