"""Tests for the extended operator set (S3/P6/A3-A6/F16/T4, events,
embedding near-dup). Oracle-level parity is covered by the driver gate
(scripts/check_correctness.py); these tests pin unit-level semantics the
oracles can't see — tolerant-reader column variants, sessionization gap
edges, stream/batch equivalence, LSH pair symmetry."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


# --- S3 custom coordinates reader -------------------------------------------

def test_custom_coords_variants(spark, tmp_path):
    from socialmapper_spark.sources import read_custom_coordinates

    p = tmp_path / "pts.json"
    p.write_text(
        '[{"y": 35.5, "x": -78.9, "name": "A", "note": "n1"},'
        ' {"latitude": 35.6, "lng": -79.0, "note": "n2"},'
        ' {"y": null, "x": -78.0, "name": "dropme"}]'
    )
    out = read_custom_coordinates(spark, str(p)).orderBy("lat").collect()
    assert len(out) == 2  # null-coordinate row dropped (P2)
    assert out[0]["lat"] == 35.5 and out[0]["lon"] == -78.9
    assert out[0]["name"] == "A" and out[0]["type"] == "custom"
    assert out[0]["tags"] == {"note": "n1"}
    # missing name/id → deterministic hash-based defaults
    assert out[1]["name"].startswith("Custom POI custom_")
    assert out[1]["id"].startswith("custom_")


def test_custom_coords_missing_coords_raises(spark, tmp_path):
    from socialmapper_spark.sources import read_custom_coordinates

    p = tmp_path / "bad.csv"
    p.write_text("a,b\n1,2\n")
    with pytest.raises(ValueError, match="no coordinate column"):
        read_custom_coordinates(spark, str(p))


# --- P6 state normalization --------------------------------------------------

def test_state_normalize_all_formats(spark):
    from socialmapper_spark.functions.states import normalize_state

    df = spark.createDataFrame(
        [("a", "NC"), ("b", "37"), ("c", "North Carolina"), ("d", " ca "),
         ("e", "06"), ("f", "6"), ("g", "Atlantis")],
        "id string, state string",
    )
    rows = {r["id"]: r for r in normalize_state(spark, df).collect()}
    for rid in ("a", "b", "c"):
        assert rows[rid]["state_fips"] == "37"
        assert rows[rid]["state_abbr"] == "NC"
        assert rows[rid]["state_name"] == "North Carolina"
    for rid in ("d", "e", "f"):
        assert rows[rid]["state_fips"] == "06"
    assert rows["g"]["state_fips"] is None  # unknown → NULL, not error


# --- A3 area -----------------------------------------------------------------

def test_polygon_area_shoelace():
    from socialmapper_spark.geo.albers import albers5070_forward
    from socialmapper_spark.geo.wkb import polygon_to_wkb
    from socialmapper_spark.operators.stats import polygon_area_km2

    ring = np.array([[-79.0, 35.0], [-78.9, 35.0], [-78.9, 35.1], [-79.0, 35.1]])
    got = polygon_area_km2(polygon_to_wkb([ring]))
    # independent cross-product shoelace on the projected ring
    x, y = albers5070_forward(ring[:, 1], ring[:, 0])
    x = np.append(x, x[0]); y = np.append(y, y[0])
    want = 0.5 * abs(np.sum(np.cross(np.stack([x[:-1], y[:-1]], 1),
                                     np.stack([x[1:], y[1:]], 1)))) / 1e6
    # shoelace on ~1.5e6 m coordinates cancels ~8 digits; 1e-6 relative is
    # the honest agreement bound between the two formulations
    assert got == pytest.approx(want, rel=1e-6)
    # ~0.1° × 0.1° near 35N ≈ 9.1 km × 11.1 km ≈ 101 km²
    assert 95 < got < 107


def test_polygon_area_with_hole():
    from socialmapper_spark.geo.wkb import polygon_to_wkb
    from socialmapper_spark.operators.stats import polygon_area_km2

    outer = np.array([[-79.0, 35.0], [-78.8, 35.0], [-78.8, 35.2], [-79.0, 35.2]])
    hole = np.array([[-78.95, 35.05], [-78.85, 35.05], [-78.85, 35.15], [-78.95, 35.15]])
    full = polygon_area_km2(polygon_to_wkb([outer]))
    holed = polygon_area_km2(polygon_to_wkb([outer, hole]))
    inner = polygon_area_km2(polygon_to_wkb([hole]))
    assert holed == pytest.approx(full - inner, rel=1e-9)


# --- events: sessionize + stream/batch equivalence ---------------------------

def test_sessionize_gap_semantics(spark):
    from socialmapper_spark.operators.events import sessionize

    rows = [
        (1, "2024-01-01 00:00:00", 10, "a", 1.0, "{}"),
        (2, "2024-01-01 00:29:59", 10, "a", 2.0, "{}"),  # within 30 min → same
        (3, "2024-01-01 01:00:00", 10, "a", 3.0, "{}"),  # 30:01 gap → new
        (4, "2024-01-01 00:10:00", 20, "b", 4.0, "{}"),  # other user
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sessionize(df, gap_minutes=30).orderBy("user_id", "session_seq").collect()
    assert [(r["user_id"], r["session_seq"], r["n_events"]) for r in out] == [
        (10, 1, 2), (10, 2, 1), (20, 1, 1),
    ]
    assert out[0]["total_value"] == 3.0


def test_sessionize_exact_gap_not_split(spark):
    from socialmapper_spark.operators.events import sessionize

    rows = [
        (1, "2024-01-01 00:00:00", 1, "a", 1.0, "{}"),
        (2, "2024-01-01 00:30:00", 1, "a", 1.0, "{}"),  # exactly 30 min → same
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sessionize(df, gap_minutes=30).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


def test_sessionize_stream_equals_batch(spark):
    from socialmapper_spark.operators.events import sessionize, sessionize_stream

    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    batch = {tuple(r) for r in sessionize(events).collect()}
    stream = {tuple(r) for r in sessionize_stream(spark, SF_SMALL).collect()}
    assert batch == stream and len(batch) > 0


def test_window_rollup_stream_equals_batch(spark):
    from socialmapper_spark.operators.events import window_rollup, window_rollup_stream

    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    batch = {tuple(r) for r in window_rollup(events).collect()}
    stream = {tuple(r) for r in window_rollup_stream(spark, SF_SMALL).collect()}
    assert batch == stream and len(batch) > 0


# --- embedding near-dup ------------------------------------------------------

def test_embedding_near_dup_matches_bruteforce(spark):
    from socialmapper_spark.operators.similarity import (
        NEAR_DUP_BITS,
        NEAR_DUP_THRESHOLD,
        _planes,
        embedding_near_dup_pairs,
        lsh_bucket_py,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    got = {
        (r["vec_a"], r["vec_b"]) for r in embedding_near_dup_pairs(spark, emb).collect()
    }
    rows = emb.orderBy("vec_id").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    planes = _planes(len(next(iter(vecs.values()))), NEAR_DUP_BITS)
    buckets = {vid: lsh_bucket_py(v, planes) for vid, v in vecs.items()}
    want = set()
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if buckets[a] != buckets[b]:
                continue
            va, vb = vecs[a], vecs[b]
            cos = (va @ vb) / (np.sqrt(va @ va) * np.sqrt(vb @ vb))
            if round(cos, 6) >= NEAR_DUP_THRESHOLD + 1e-6 or (
                cos >= NEAR_DUP_THRESHOLD - 1e-6 and (a, b) in got
            ):
                want.add((a, b))
    # brute force with a tolerance band: every clear pair found, nothing
    # outside the band reported
    assert want <= got
    for a, b in got:
        va, vb = vecs[a], vecs[b]
        cos = (va @ vb) / (np.sqrt(va @ va) * np.sqrt(vb @ vb))
        assert cos >= NEAR_DUP_THRESHOLD - 1e-6
        assert buckets[a] == buckets[b]


def test_ivf_ann_recall_vs_exact(spark):
    from socialmapper_spark.operators.similarity import cosine_topk, ivf_ann_topk

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    qids = [0, 1, 2]
    exact = cosine_topk(spark, emb, qids, k=10).collect()
    approx = ivf_ann_topk(spark, emb, qids, k=10).collect()
    exact_set = {(r["query_id"], r["vec_id"]) for r in exact}
    approx_set = {(r["query_id"], r["vec_id"]) for r in approx}
    # every approx hit carries the same cosine the exact path computed
    exact_cos = {(r["query_id"], r["vec_id"]): r["cosine"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["vec_id"])
        if key in exact_cos:
            assert r["cosine"] == exact_cos[key]
    # nprobe=4 of 16 lists must still recover a reasonable share of top-10
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"


# --- raster ↔ vector ---------------------------------------------------------

def test_raster_roundtrip(spark, geo_small):
    from socialmapper_spark.operators.raster import (
        rasterize_counts,
        tile_arrays,
        vectorize_threshold,
    )
    from socialmapper_spark.pipeline import geoparse_pages

    geop = geoparse_pages(spark.read.parquet(f"{geo_small}/pages.parquet"))
    n_points = geop.filter(F.col("lat").isNotNull()).count()
    raster = rasterize_counts(geop)
    # mass conservation: pixel values sum to the point count
    assert raster.agg(F.sum("value")).first()[0] == n_points
    # pixel addresses are within the 32x32 tile
    bad = raster.filter(
        (F.col("px_row") < 0) | (F.col("px_row") > 31)
        | (F.col("px_col") < 0) | (F.col("px_col") > 31)
    ).count()
    assert bad == 0
    # dense tiles carry the same mass
    tiles = tile_arrays(raster).collect()
    assert sum(sum(t["values"]) for t in tiles) == n_points
    assert all(t["side"] == 32 and len(t["values"]) == 1024 for t in tiles)
    # vectorize: every hotspot cell's bounds contain ≥ threshold points
    hot = vectorize_threshold(raster, threshold=5, with_wkb=True).collect()
    assert len(hot) > 0
    pts = geop.filter(F.col("lat").isNotNull()).select("lat", "lon").collect()
    for h in hot[:5]:
        inside = sum(
            1 for p in pts
            if h["lat_min"] <= p["lat"] < h["lat_max"]
            and h["lon_min"] <= p["lon"] < h["lon_max"]
        )
        assert inside == h["value"]
        assert h["geometry_wkb"] is not None
    # raster→vector→raster closes: hotspot cells re-encode to themselves
    from socialmapper_spark.geo.cells import cell_np

    for h in hot[:5]:
        mid_lat = (h["lat_min"] + h["lat_max"]) / 2
        mid_lon = (h["lon_min"] + h["lon_max"]) / 2
        assert int(cell_np([mid_lat], [mid_lon], 9)[0]) == h["cell"]


# --- F16 quantile bins -------------------------------------------------------

def test_quantile_bins_balanced(spark, geo_small):
    from socialmapper_spark.operators.census import pivot_census
    from socialmapper_spark.operators.stats import quantile_bins

    wide = pivot_census(spark.read.parquet(f"{geo_small}/census_long.parquet"))
    out = quantile_bins(wide, "B19013_001E", k=5)
    counts = {r["bin"]: r["n"] for r in out.groupBy("bin").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {1, 2, 3, 4, 5}
    assert max(counts.values()) - min(counts.values()) <= 1  # ntile balance


def test_quantile_bins_scale_safe_plan_and_ntile_parity(spark):
    """quantile_bins must not funnel the table through a single task (no
    un-partitioned window / SinglePartition exchange) yet still reproduce
    ntile's bucket arithmetic exactly — including boundaries that split a
    tie group, which value-based bin edges cannot express."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    from socialmapper_spark.operators.stats import quantile_bins

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {
            "geoid": [f"g{i:04d}" for i in range(997)],
            "B19013_001E": np.round(rng.uniform(1, 60, 997), 0),  # heavy ties
        }
    )
    df = spark.createDataFrame(pdf)
    out = quantile_bins(df, "B19013_001E", k=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    w = Window.orderBy(F.col("B19013_001E").asc_nulls_last(), F.col("geoid").asc())
    ref = df.select(
        "geoid",
        F.col("B19013_001E").alias("value"),
        F.ntile(7).over(w).alias("bin"),
    )
    got = {r["geoid"]: (r["value"], r["bin"]) for r in out.collect()}
    exp = {r["geoid"]: (r["value"], r["bin"]) for r in ref.collect()}
    assert got == exp
