"""Raster ↔ vector conversion (north_rule: "H3/S2 index, point-in-polygon,
kNN, raster↔vector").

The raster model is the standard distributed one: a raster is a TABLE of
pixels grouped into fixed-size square tiles — `(tile_id, px_row, px_col,
value)` — where the tile id is the parent cell of the pixel cell at a
coarser resolution. Tiles are the unit of partitioning/IO (one tile ≈ one
row group; a region query prunes tiles by id range), pixels are cell
counts or any per-cell aggregate.

- :func:`rasterize_counts` — vector→raster: points (geoparsed pages) are
  binned into cells at ``res`` (pure Catalyst cell math), counted
  (map-side-combinable hash agg), and addressed as (tile, row, col)
  pixels with exact integer bit arithmetic. No UDF anywhere.
- :func:`tile_arrays` — materializes each tile as a dense 2-D array via
  ``applyInPandas`` (one group per tile) — the shape a real raster
  consumer (GeoTIFF writer, conv feature extractor) ingests.
- :func:`vectorize_threshold` — raster→vector: pixels above a threshold
  come back as cell polygons with exact bounds (and WKB geometry for
  interop), i.e. hotspot extraction. Again pure Catalyst except the
  (optional) WKB bytes.

Reference tie-in: the reference has no raster layer; its closest analog
is the choropleth binning (visualization/chloropleth.py) which bins
values over polygons. This operator family generalizes that to the cell
grid the whole engine is keyed on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from socialmapper_spark.geo.cells import _IX_SHIFT, _R_SHIFT, cell_col, cell_size_deg

DEFAULT_RES = 9
DEFAULT_TILE_RES = 4


_IX_BITS = 29  # log2(_IX_SHIFT) — keep in sync with geo/cells.py


def _ix(cell: F.Column) -> F.Column:
    """x-index from an encoded cell OR tile id (same bit layout:
    res·2^58 + ix·2^29 + iy). Exact integer ops only — the previous
    floor(rem / 2^29) evaluated in double, whose 53-bit mantissa can
    misfloor once rem ≥ 2^53 (res ≥ 17; MAX_RES is 22). shiftright is
    integer floor-division by 2^29 for the non-negative pmod remainder
    (r4 ADVICE raster.py:108)."""
    return F.shiftright(F.pmod(cell, F.lit(_R_SHIFT)), _IX_BITS).cast("long")


def _iy(cell: F.Column) -> F.Column:
    """y-index from an encoded cell or tile id — exact integer mod
    (2^58 is a multiple of 2^29, so cell % 2^29 ≡ (cell % 2^58) % 2^29)."""
    return F.pmod(cell, F.lit(_IX_SHIFT)).cast("long")


def rasterize_counts(
    points: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    res: int = DEFAULT_RES,
    tile_res: int = DEFAULT_TILE_RES,
) -> DataFrame:
    """Vector → raster: per-pixel point counts, tiled.

    Output: (tile_id long, px_row int, px_col int, value long) — px_row/
    px_col are the pixel's offset within its 2^dr × 2^dr tile.
    """
    dr = res - tile_res
    side = 1 << dr
    pts = points.filter(F.col(lat).isNotNull() & F.col(lon).isNotNull())
    cells = pts.select(cell_col(F.col(lat), F.col(lon), res).alias("cell"))
    counts = cells.groupBy("cell").agg(F.count("*").alias("value"))
    ix, iy = _ix(F.col("cell")), _iy(F.col("cell"))
    tile = (
        F.lit(tile_res).cast("long") * F.lit(_R_SHIFT)
        + F.shiftright(ix, dr).cast("long") * F.lit(_IX_SHIFT)
        + F.shiftright(iy, dr).cast("long")
    )
    return counts.select(
        tile.alias("tile_id"),
        F.pmod(iy, F.lit(side)).cast("int").alias("px_row"),
        F.pmod(ix, F.lit(side)).cast("int").alias("px_col"),
        "value",
    )


def focal_stats(
    raster: DataFrame,
    res: int = DEFAULT_RES,
    tile_res: int = DEFAULT_TILE_RES,
) -> DataFrame:
    """3×3 focal (moving-window) statistics over the pixel table — the
    raster smoothing step that precedes hotspot vectorization (GIS focal
    sum/mean; zero-padded semantics: ``focal_mean = focal_sum / 9.0``
    regardless of how many neighbors hold data, so empty cells count as
    zero exactly like a dense-array convolution).

    Output: one row per cell RECEIVING any contribution (the 3×3
    dilation of the data support): ``(cell, focal_sum, focal_n,
    focal_mean)`` where focal_n counts the non-empty contributing
    pixels. Grid topology matches the cell index: longitude wraps
    (pmod), latitude clamps (off-grid rows drop — no wrap across the
    poles).

    Scale shape (pure Catalyst): the 3×3 explode is a narrow 9× fan-out
    of the already-aggregated pixel table (tiny vs the corpus); the only
    shuffle is one map-side-combinable hash agg on the neighbor cell
    key. No Python, no window functions, no driver state.
    """
    dr = res - tile_res
    side = 1 << dr
    nx, ny = 1 << (res + 7), 1 << (res + 6)
    ix = _ix(F.col("tile_id")) * F.lit(side) + F.col("px_col")
    iy = _iy(F.col("tile_id")) * F.lit(side) + F.col("px_row")
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    fan = raster.select(
        ix.alias("__ix"), iy.alias("__iy"), "value", F.explode(offsets).alias("o")
    )
    jx = F.pmod(F.col("__ix") + F.col("o.dx"), F.lit(nx))
    jy = F.col("__iy") + F.col("o.dy")
    contrib = fan.filter((jy >= 0) & (jy < ny)).select(
        jx.alias("__jx"), jy.alias("__jy"), "value"
    )
    cell = (
        F.lit(res).cast("long") * F.lit(_R_SHIFT)
        + F.col("__jx").cast("long") * F.lit(_IX_SHIFT)
        + F.col("__jy").cast("long")
    )
    return (
        contrib.groupBy("__jx", "__jy")
        .agg(
            F.sum("value").alias("focal_sum"),
            F.count("*").cast("long").alias("focal_n"),
        )
        .select(
            cell.alias("cell"),
            "focal_sum",
            "focal_n",
            (F.col("focal_sum") / F.lit(9.0)).alias("focal_mean"),
        )
    )


def downsample_counts(
    raster: DataFrame,
    res: int = DEFAULT_RES,
    to_res: int = 7,
    tile_res: int = DEFAULT_TILE_RES,
) -> DataFrame:
    """Raster pyramid/overview construction: aggregate the pixel table
    from ``res`` down to ``to_res`` (each coarse pixel sums its
    2^(res−to_res) × 2^(res−to_res) children — the overview levels a
    tile server or zoomable map reads instead of rescanning the base
    raster). Output has the same tiled schema as
    :func:`rasterize_counts` at ``to_res``, so vectorize/focal/further
    downsampling compose on it unchanged.

    Pure Catalyst integer math: parent indices are bit-shifts of the
    child indices (the cell hierarchy is power-of-two by construction,
    geo/cells.py), and the single shuffle is a map-side-combinable sum
    keyed on the parent pixel — building a full pyramid is one such agg
    per level over ever-shrinking tables.
    """
    if not 0 <= to_res < res:
        raise ValueError(f"to_res must be in [0, {res}), got {to_res}")
    if to_res < tile_res:
        raise ValueError(f"to_res {to_res} below tile_res {tile_res}")
    shift = res - to_res
    dr = to_res - tile_res
    side = 1 << dr
    in_side = 1 << (res - tile_res)
    ix = _ix(F.col("tile_id")) * F.lit(in_side) + F.col("px_col")
    iy = _iy(F.col("tile_id")) * F.lit(in_side) + F.col("px_row")
    parents = raster.select(
        F.shiftright(ix, shift).alias("__jx"),
        F.shiftright(iy, shift).alias("__jy"),
        "value",
    ).groupBy("__jx", "__jy").agg(F.sum("value").alias("value"))
    tile = (
        F.lit(tile_res).cast("long") * F.lit(_R_SHIFT)
        + F.shiftright(F.col("__jx"), dr).cast("long") * F.lit(_IX_SHIFT)
        + F.shiftright(F.col("__jy"), dr).cast("long")
    )
    return parents.select(
        tile.alias("tile_id"),
        F.pmod(F.col("__jy"), F.lit(side)).cast("int").alias("px_row"),
        F.pmod(F.col("__jx"), F.lit(side)).cast("int").alias("px_col"),
        "value",
    )


def zonal_stats(
    spark,
    raster: DataFrame,
    polygons: DataFrame,
    res: int = DEFAULT_RES,
    tile_res: int = DEFAULT_TILE_RES,
) -> DataFrame:
    """Zonal statistics — THE classic raster×vector analysis: aggregate
    raster pixel values per polygon zone (pixel membership = cell CENTER
    inside the polygon, the standard center-rule). Output one row per
    polygon with ≥1 pixel: (poly_id, GEOID, kind, n_pixels, total_value,
    mean_value).

    Scale shape: pixel centers are exact Catalyst arithmetic on the
    already-aggregated pixel table; the polygon side reuses the engine's
    two-phase machinery (prepare_polygons cell cover broadcast →
    pip_refine_expr exact ray-cast), so the pixel table never shuffles
    for the join — the only wide exchange is the final per-polygon agg,
    which is map-side combinable. No Python on the pixel path (the
    polygon prep's mapInPandas is polygon-table-sized, as in the
    flagship).
    """
    from socialmapper_spark.geo.cells import cell_size_deg
    from socialmapper_spark.operators.spatial_join import (
        PREFILTER_RES,
        prepare_polygons,
        spatial_join,
    )

    size = cell_size_deg(res)
    in_side = 1 << (res - tile_res)
    ix = _ix(F.col("tile_id")) * F.lit(in_side) + F.col("px_col")
    iy = _iy(F.col("tile_id")) * F.lit(in_side) + F.col("px_row")
    centers = raster.select(
        "value",
        ((ix.cast("double") + F.lit(0.5)) * F.lit(size) - F.lit(180.0)).alias("__lon"),
        ((iy.cast("double") + F.lit(0.5)) * F.lit(size) - F.lit(90.0)).alias("__lat"),
    )
    index = prepare_polygons(spark, polygons, PREFILTER_RES)
    hits = spatial_join(centers, index, lat="__lat", lon="__lon")
    return (
        hits.join(F.broadcast(index.meta_df), "poly_id")
        .groupBy("poly_id", "GEOID", "kind")
        .agg(
            F.count("*").alias("n_pixels"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "poly_id",
            "GEOID",
            "kind",
            "n_pixels",
            "total_value",
            (F.col("total_value") / F.col("n_pixels")).alias("mean_value"),
        )
    )


def rasterize_polygons(
    spark,
    polygons: DataFrame,
    res: int = DEFAULT_RES,
) -> DataFrame:
    """Polygon burn — vector polygons → raster cells: one (cell, poly_id)
    row per resolution-``res`` cell whose CENTER lies inside the polygon
    (center-rule, the same membership zonal_stats uses — burn then zonal
    compose exactly). Completes the raster↔vector matrix: points→raster
    (rasterize_counts), polygons→raster (this), raster→vector
    (vectorize_threshold), raster→raster (focal, pyramid), raster×vector
    (zonal).

    Scale shape: candidate cells are the children of the polygon's
    cell cover at PREFILTER_RES — the cover is a no-false-negative
    over-approximation (geo/cells.py), so center-inside cells are never
    missed and the exact ray-cast refine removes the rest. Everything is
    polygon-table-sized: the cover mapInPandas, the child explode
    (4^(res−cover_res) per cover cell, in-plan sequence), and the
    broadcast edge join; the corpus never participates. No shuffle of
    anything bigger than the burned cell set itself.
    """
    from socialmapper_spark.geo.cells import cell_size_deg
    from socialmapper_spark.operators.spatial_join import (
        PREFILTER_RES,
        pip_refine_expr,
        prepare_polygons,
    )

    cover_res = PREFILTER_RES
    if res < cover_res:
        raise ValueError(f"res {res} below cover resolution {cover_res}")
    steps = res - cover_res
    per_axis = 1 << steps
    size = cell_size_deg(res)
    index = prepare_polygons(spark, polygons, cover_res)
    cix, ciy = _ix(F.col("cell")), _iy(F.col("cell"))
    kids = index.cells_df.select(
        "poly_id",
        (cix * F.lit(per_axis)).alias("__bx"),
        (ciy * F.lit(per_axis)).alias("__by"),
        F.explode(F.sequence(F.lit(0), F.lit(per_axis * per_axis - 1))).alias("__o"),
    ).select(
        "poly_id",
        (F.col("__bx") + F.col("__o") % per_axis).alias("__jx"),
        (F.col("__by") + F.shiftright(F.col("__o"), steps).cast("long")).alias("__jy"),
    )
    lon_c = (F.col("__jx").cast("double") + F.lit(0.5)) * F.lit(size) - F.lit(180.0)
    lat_c = (F.col("__jy").cast("double") + F.lit(0.5)) * F.lit(size) - F.lit(90.0)
    hits = (
        kids.join(F.broadcast(index.geoms_df), "poly_id")
        .filter(pip_refine_expr(F.col("__edges"), lon_c, lat_c))
    )
    cell = (
        F.lit(res).cast("long") * F.lit(_R_SHIFT)
        + F.col("__jx") * F.lit(_IX_SHIFT)
        + F.col("__jy")
    )
    return hits.select(cell.alias("cell"), "poly_id")


def tile_arrays(
    raster: DataFrame, res: int = DEFAULT_RES, tile_res: int = DEFAULT_TILE_RES
) -> DataFrame:
    """Materialize dense per-tile arrays: (tile_id, side, values flat list,
    row-major). One grouped-map UDF per tile — the Arrow batch IS the tile.
    """
    side = 1 << (res - tile_res)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        arr = np.zeros((side, side), dtype=np.int64)
        arr[pdf["px_row"].to_numpy(), pdf["px_col"].to_numpy()] = pdf["value"].to_numpy()
        return pd.DataFrame(
            {
                "tile_id": [int(pdf["tile_id"].iloc[0])],
                "side": [side],
                "values": [arr.ravel().tolist()],
            }
        )

    return raster.groupBy("tile_id").applyInPandas(
        build, "tile_id long, side int, values array<long>"
    )


def vectorize_threshold(
    raster: DataFrame,
    threshold: int,
    res: int = DEFAULT_RES,
    tile_res: int = DEFAULT_TILE_RES,
    with_wkb: bool = False,
) -> DataFrame:
    """Raster → vector: pixels with value ≥ threshold as cell polygons.

    Output: (cell, value, lat_min, lat_max, lon_min, lon_max) with exact
    cell-boundary coordinates (pure Catalyst); ``with_wkb`` adds the WKB
    polygon bytes for interop (Arrow UDF, off the comparison path).
    """
    dr = res - tile_res
    side = 1 << dr
    size = cell_size_deg(res)
    ix = _ix(F.col("tile_id")) * F.lit(side) + F.col("px_col")
    iy = _iy(F.col("tile_id")) * F.lit(side) + F.col("px_row")
    cell = (
        F.lit(res).cast("long") * F.lit(_R_SHIFT)
        + ix.cast("long") * F.lit(_IX_SHIFT)
        + iy.cast("long")
    )
    lon_min = ix.cast("double") * F.lit(size) - F.lit(180.0)
    lat_min = iy.cast("double") * F.lit(size) - F.lit(90.0)
    out = raster.filter(F.col("value") >= threshold).select(
        cell.alias("cell"),
        "value",
        lat_min.alias("lat_min"),
        (lat_min + F.lit(size)).alias("lat_max"),
        lon_min.alias("lon_min"),
        (lon_min + F.lit(size)).alias("lon_max"),
    )
    if with_wkb:
        from pyspark.sql.functions import pandas_udf

        from socialmapper_spark.geo.wkb import polygon_to_wkb

        @pandas_udf("binary")
        def cell_wkb(lat0: pd.Series, lat1: pd.Series, lon0: pd.Series, lon1: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    polygon_to_wkb(
                        [np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])]
                    )
                    for y0, y1, x0, x1 in zip(lat0, lat1, lon0, lon1)
                ]
            )

        out = out.withColumn(
            "geometry_wkb",
            cell_wkb(F.col("lat_min"), F.col("lat_max"), F.col("lon_min"), F.col("lon_max")),
        )
    return out
