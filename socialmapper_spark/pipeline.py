"""End-to-end pipelines (SURVEY.md §3.5) — the engine's flagship query.

Flagship (SURVEY.md §7.4, mirroring reference tutorial 01 +
api/client.py:259-291): per travel-time-band (isochrone), the demographic
summary over the census block groups whose pages fall inside the band —
pages → geoparse → cell index → two-phase PIP vs isochrones AND block
groups → census pivot-join (sentinel-cleansed) → A1 aggregation
(sum population / mean income).

Plan shape at scale: the pages scan is joined twice against broadcast
polygon indexes (no shuffle of the big side), the url-level
iso×blockgroup pairing shuffles only matched rows on url, and the final
aggregate is a hash agg on (poly_id, GEOID) pairs — tiny. Hot-cell skew
in the pages table never reaches a shuffle boundary with the page row
attached.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from socialmapper_spark.geo.geoparse import geoparse_cols
from socialmapper_spark.operators.census import pivot_census
from socialmapper_spark.operators.spatial_join import (
    PREFILTER_RES,
    prepare_polygons,
    spatial_join,
)
from socialmapper_spark.geo.cells import cell_col


def geoparse_pages(pages: DataFrame) -> DataFrame:
    """pages → geoparsed(url, warc_ts, lang, lat, lon, mentions, cell_r7/8/9).

    Pure Catalyst — regexp + array ops + arithmetic; no UDF, no shuffle.
    """
    g = geoparse_cols(F.col("text"))
    out = pages.select(
        "url",
        "warc_ts",
        "lang",
        g["lat"].alias("lat"),
        g["lon"].alias("lon"),
        g["mentions"].alias("mentions"),
    )
    for r in (7, 8, 9):
        out = out.withColumn(f"cell_r{r}", cell_col(F.col("lat"), F.col("lon"), r))
    return out


def page_assignments(spark: SparkSession, pages: DataFrame, polygons: DataFrame) -> DataFrame:
    """pages × polygons containment → (url, poly_id, GEOID, kind, cell_r9).

    The J2 point-in-polygon assignment; output mirrors GeocodeResult
    (reference entities.py:101-113) with poly metadata joined back.
    """
    geop = geoparse_pages(pages).filter(F.col("lat").isNotNull())
    index = prepare_polygons(spark, polygons, PREFILTER_RES)
    hits = spatial_join(geop, index, cell="cell_r7")
    return hits.join(F.broadcast(index.meta_df), "poly_id").select(
        "url", "poly_id", "GEOID", "kind", "cell_r9",
        "travel_time_minutes", "travel_mode",
    )


def flagship_query(
    spark: SparkSession,
    pages: DataFrame,
    polygons: DataFrame,
    census_long: DataFrame,
) -> DataFrame:
    """Per-isochrone demographic summary (travel-time-band aggregation).

    Returns one row per isochrone poly_id:
      (iso_id, travel_time_minutes, n_pages, n_block_groups,
       total_population, median_household_income)
    ordered by iso_id. Median income is the plain mean of block-group
    medians — reference semantics, deliberately not weighted
    (api/client.py:283-286).
    """
    # single pass over the (expensive) assignment stream: per-url agg with
    # map-side combine collects that page's isochrones and block groups at
    # once, so the PIP join executes exactly once and the only wide shuffle
    # carries (url, small arrays) — at 100 TB this avoids recomputing or
    # caching the assignment stream for the iso/bg/count branches.
    assigns = page_assignments(spark, pages, polygons)
    per_url = (
        assigns.groupBy("url")
        .agg(
            F.collect_set(
                F.when(
                    F.col("kind") == "isochrone",
                    F.struct("poly_id", "travel_time_minutes"),
                )
            ).alias("isos"),
            F.collect_set(
                F.when(F.col("kind") == "blockgroup", F.col("GEOID"))
            ).alias("bgs"),
        )
        .filter((F.size("isos") > 0) & (F.size("bgs") > 0))
        # two consumers (pair explosion + page counts) with different column
        # prunings defeat ReuseExchange, which would re-run the PIP join.
        # per_url is the matched-page aggregate — the same intermediate the
        # staged production pipeline materializes as a lineage-checkpointed
        # table between stage 1 (assign) and stage 2 (aggregate); persist()
        # is its single-job analog. Spill-safe (MEMORY_AND_DISK default).
        .persist()
    )
    iso_pairs = per_url.select("url", F.explode("isos").alias("iso"), "bgs")
    # per_url holds exactly one row per url, so after the iso explode each
    # (url, iso) pair is already unique: n_pages is a plain map-side-
    # combinable count — no countDistinct expand, one less wide shuffle
    page_counts = iso_pairs.groupBy(F.col("iso.poly_id").alias("iso_id")).agg(
        F.count("*").alias("n_pages")
    )
    pairs = iso_pairs.select(
        "url",
        F.col("iso.poly_id").alias("iso_id"),
        F.col("iso.travel_time_minutes").alias("travel_time_minutes"),
        F.explode("bgs").alias("bg_geoid"),
    )
    iso_bgs = pairs.select("iso_id", "travel_time_minutes", "bg_geoid").distinct()

    wide = pivot_census(census_long)
    joined = iso_bgs.join(wide, iso_bgs["bg_geoid"] == wide["geoid"], "left")
    from socialmapper_spark.operators.census import dmean, dsum

    per_iso = joined.groupBy("iso_id", "travel_time_minutes").agg(
        F.countDistinct("bg_geoid").alias("n_block_groups"),
        dsum("B01003_001E").alias("total_population"),
        dmean("B19013_001E").alias("median_household_income"),
    )
    return (
        per_iso.join(page_counts, "iso_id")
        .select(
            "iso_id",
            "travel_time_minutes",
            "n_pages",
            "n_block_groups",
            "total_population",
            "median_household_income",
        )
        .orderBy("iso_id")
    )
