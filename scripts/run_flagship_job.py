"""Production job entry — `spark-submit --py-files engine.zip
scripts/run_flagship_job.py --pages ... --polygons ... --census ...
--out ...` (SURVEY.md §7.1 M6).

Stages (each resumable via the lineage checkpoint table):

  1. assign  — geoparse → cell encode → two-phase PIP join; written
               bucketed by url-hash with per-bucket lineage rows
               (row count, cell range, xxhash64-XOR checksum).
  2. rollup  — travel-time-band demographic aggregation over the
               checkpointed assignments, exported via the auto-format
               sink.

On restart after a failure, completed buckets of stage 1 are skipped
(anti-join against the lineage table) — the north_rule's
resume-without-recompute. Zero per-row Python: the only Python on
executors is the vectorized PIP-refine Arrow UDF.

Build the zip:  cd /root/repo && zip -r engine.zip socialmapper_spark
Local smoke:    python scripts/run_flagship_job.py --sf /root/testdata/sf0.001 --out /tmp/flagship_job
"""

from __future__ import annotations

import argparse
import sys

try:  # provided by `--py-files engine.zip` under spark-submit
    import socialmapper_spark  # noqa: F401
except ImportError:  # bare `python scripts/run_flagship_job.py` local smoke
    sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", help="fixture sf dir (driver testdata); sets all inputs")
    ap.add_argument("--pages")
    ap.add_argument("--polygons")
    ap.add_argument("--census")
    ap.add_argument("--out", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument(
        "--chunk-buckets", type=int, default=None,
        help="commit granularity: buckets per lineage commit (bounds the "
        "recompute window a crash can lose; default = whole stage)",
    )
    args = ap.parse_args()

    from socialmapper_spark.fixtures import geo_dir_for
    from socialmapper_spark.lineage import run_stage_with_lineage, verify_lineage
    from socialmapper_spark.operators.census import dmean, dsum, pivot_census
    from socialmapper_spark.pipeline import page_assignments
    from socialmapper_spark.session import get_spark
    from socialmapper_spark.sinks import export_units

    if args.sf:
        geo = str(geo_dir_for(args.sf))
        args.pages = args.pages or f"{geo}/pages.parquet"
        args.polygons = args.polygons or f"{geo}/polygons.parquet"
        args.census = args.census or f"{geo}/census_long.parquet"
    if not (args.pages and args.polygons and args.census):
        ap.error("need --sf or all of --pages/--polygons/--census")

    spark = get_spark(app_name="flagship-job", master=args.master)
    pages = spark.read.parquet(args.pages)
    polygons = spark.read.parquet(args.polygons)
    census = spark.read.parquet(args.census)

    assign_path = f"{args.out}/assignments"
    lineage_path = f"{args.out}/lineage"

    # stage 1: resumable assignment
    assigns = page_assignments(spark, pages, polygons)
    n_done = run_stage_with_lineage(
        spark, assigns, "assign", "url", ["url", "poly_id"],
        assign_path, lineage_path, n_buckets=args.n_buckets, cell_col="cell_r9",
        chunk_size=args.chunk_buckets,
    )
    ok = verify_lineage(
        spark, assign_path, lineage_path, "assign", ["url", "poly_id"], "cell_r9"
    )
    print(f"stage assign: {n_done} buckets processed this run, lineage verified: {ok}")
    if not ok:
        raise SystemExit("lineage checksum mismatch — refusing to aggregate")

    # stage 2: travel-time-band rollup from the checkpointed table
    a = spark.read.parquet(assign_path)
    iso = a.filter(F.col("kind") == "isochrone").select(
        "url", F.col("poly_id").alias("iso_id"), "travel_time_minutes"
    )
    bg = a.filter(F.col("kind") == "blockgroup").select(
        "url", F.col("GEOID").alias("bg_geoid")
    )
    pairs = iso.join(bg, "url")
    iso_bgs = pairs.select("iso_id", "travel_time_minutes", "bg_geoid").distinct()
    page_counts = pairs.groupBy("iso_id").agg(F.countDistinct("url").alias("n_pages"))
    wide = pivot_census(census)
    per_iso = (
        iso_bgs.join(wide, iso_bgs["bg_geoid"] == wide["geoid"], "left")
        .groupBy("iso_id", "travel_time_minutes")
        .agg(
            F.countDistinct("bg_geoid").alias("n_block_groups"),
            dsum("B01003_001E").alias("total_population"),
            dmean("B19013_001E").alias("median_household_income"),
        )
        .join(page_counts, "iso_id")
    )
    fmt = export_units(per_iso, f"{args.out}/demographics")
    print(f"stage rollup: wrote demographics as {fmt}")
    spark.stop()


if __name__ == "__main__":
    main()
