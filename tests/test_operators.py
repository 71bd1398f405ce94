"""Operator parity vs brute-force numpy goldens (SURVEY.md §5.2)."""

import pytest
from pyspark.sql import functions as F

from socialmapper_spark.operators.census import (
    demographic_summary,
    dedup_units,
    pivot_census,
)
from socialmapper_spark.operators.knn import knn_join
from socialmapper_spark.operators.spatial_join import prepare_polygons, spatial_join
from socialmapper_spark.pipeline import flagship_query, geoparse_pages, page_assignments


@pytest.fixture(scope="module")
def tables(spark, geo_small):
    return {
        "pages": spark.read.parquet(f"{geo_small}/pages.parquet"),
        "polygons": spark.read.parquet(f"{geo_small}/polygons.parquet"),
        "pois": spark.read.parquet(f"{geo_small}/pois.parquet"),
        "census_long": spark.read.parquet(f"{geo_small}/census_long.parquet"),
        "golden_assignments": spark.read.parquet(f"{geo_small}/golden_assignments.parquet"),
        "golden_knn": spark.read.parquet(f"{geo_small}/golden_knn.parquet"),
    }


def test_spatial_join_matches_golden(spark, tables):
    """Two-phase PIP join must exactly reproduce the brute-force golden."""
    assigns = page_assignments(spark, tables["pages"], tables["polygons"])
    got = sorted(
        (r["url"], r["poly_id"], r["GEOID"], r["kind"])
        for r in assigns.select("url", "poly_id", "GEOID", "kind").collect()
    )
    exp = sorted(
        (r["url"], r["poly_id"], r["GEOID"], r["kind"])
        for r in tables["golden_assignments"].collect()
    )
    assert got == exp
    assert len(got) > 1000  # non-trivial fixture


def test_knn_broadcast_matches_golden(spark, tables):
    geop = geoparse_pages(tables["pages"])
    valid_pois = tables["pois"].filter(F.col("lat") <= 90)  # P1 quarantine
    got = {
        r["url"]: (r["poi_id"], round(r["distance_km"], 9))
        for r in knn_join(spark, geop, valid_pois, k=1, strategy="broadcast").collect()
    }
    exp = {
        r["url"]: (r["poi_id"], round(r["distance_km"], 9))
        for r in tables["golden_knn"].collect()
    }
    assert got == exp


def test_knn_kring_matches_broadcast(spark, tables):
    geop = geoparse_pages(tables["pages"]).limit(500)
    valid_pois = tables["pois"].filter(F.col("lat") <= 90)
    a = {
        (r["url"], r["knn_rank"]): (r["poi_id"], round(r["distance_km"], 9))
        for r in knn_join(spark, geop, valid_pois, k=2, strategy="broadcast").collect()
    }
    b = {
        (r["url"], r["knn_rank"]): (r["poi_id"], round(r["distance_km"], 9))
        for r in knn_join(spark, geop, valid_pois, k=2, strategy="kring").collect()
    }
    assert a == b


def test_pivot_census_cleanses_sentinels(spark, tables):
    wide = pivot_census(tables["census_long"])
    row = wide.agg(
        F.min("B01003_001E"), F.min("B19013_001E"), F.min("B01002_001E")
    ).collect()[0]
    # sentinels (-999999999 etc.) and negative B19 values must be NULL, so
    # minima stay within the generated value ranges
    assert row[0] >= 500.0
    assert row[1] >= 30000.0
    assert row[2] >= 25.0


def test_demographic_summary_dispatch(spark):
    df = spark.createDataFrame(
        [(100.0, 50000.0), (200.0, 70000.0), (None, None)],
        "B01003_001E double, B19013_001E double",
    )
    row = demographic_summary(df, ["B01003_001E", "B19013_001E"]).collect()[0]
    assert row["B01003_001E"] == 300.0  # sum
    assert row["B19013_001E"] == 60000.0  # mean


def test_dedup_units_rules(spark):
    df = spark.createDataFrame(
        [
            ("g1", "lib", "custom", "drive", 5.0, 15, 111.0, "b"),
            ("g1", "lib", "custom", "drive", 3.0, 10, 222.0, "a"),
            ("g2", "lib", "custom", "drive", 9.0, 15, 333.0, "c"),
        ],
        "census_block_group string, poi_name string, poi_type string, "
        "travel_mode string, distance_miles double, travel_time_minutes int, "
        "total_population double, url string",
    )
    out = {
        r["census_block_group"]: (r["distance_miles"], r["travel_time_minutes"], r["total_population"])
        for r in dedup_units(df, first_cols=["total_population"]).collect()
    }
    assert out["g1"] == (3.0, 10, 222.0)  # min, min, first-by-url ('a' row)
    assert out["g2"] == (9.0, 15, 333.0)


def test_flagship_query(spark, tables):
    out = flagship_query(
        spark, tables["pages"], tables["polygons"], tables["census_long"]
    ).collect()
    assert len(out) == 5  # five isochrones
    for r in out:
        assert r["travel_time_minutes"] == 15
        assert r["n_pages"] > 0
        assert r["total_population"] is not None and r["total_population"] > 0
        assert 30000.0 <= r["median_household_income"] <= 120000.0


def test_spatial_join_plan_shape(spark, tables):
    """The points side must reach the join without a shuffle: broadcast
    hash join in phase 1, no Exchange on the pages scan side."""
    geop = geoparse_pages(tables["pages"]).filter(F.col("lat").isNotNull())
    index = prepare_polygons(spark, tables["polygons"])
    plan = spatial_join(geop, index, cell="cell_r7")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    first_exchange = plan.find("Exchange")
    assert first_exchange == -1 or "broadcast" in plan[first_exchange : first_exchange + 60].lower()
