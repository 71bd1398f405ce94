"""One timed raster↔vector run for the scaling harness (sixth workload
— evidences the north rule's last named operator family, "raster↔vector",
independently: vector→raster burn, focal smoothing, raster→vector
hotspot extraction).

Usage: python scripts/scaling_raster.py <cores> <replicate>

Pipeline under test (the rasterize/focal_stats/vectorize_hotspots
registry compositions chained end to end): geoparse pages →
rasterize_counts (per-pixel page counts, one map-side-combinable
groupBy over tile/pixel keys) → focal_stats (3×3 zero-padded moving
window via in-plan neighbor explode) → checksum, plus
vectorize_threshold hotspots over the same raster → checksum. All pure
Catalyst — the whole family has zero Python nodes (PLAN_AUDIT.json).

Fixture: sf0.1 geo pages replicated <replicate>x IN-PLAN (per-copy url
and text variation, same rationale as scaling_flagship.py). Replication
multiplies the scan/geoparse volume and the per-pixel counts while the
pixel grid cardinality stays bounded by the coordinate domain — exactly
the production shape (more pages densify pixels; the grid does not
outgrow the world). Fresh JVM per invocation; prints one JSON line
{"cores": N, "sec": t, "pages": n, "pixels": p}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", str(1 * 1024 * 1024))

from pyspark.sql import functions as F  # noqa: E402

from socialmapper_spark.fixtures import geo_dir_for  # noqa: E402
from socialmapper_spark.operators.raster import (  # noqa: E402
    focal_stats,
    rasterize_counts,
    vectorize_threshold,
)
from socialmapper_spark.pipeline import geoparse_pages  # noqa: E402
from socialmapper_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    geo = str(geo_dir_for("/root/testdata/sf0.1"))
    spark = get_spark(
        app_name=f"scaling-raster-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(2 * cores, 16),
    )
    pages = spark.read.parquet(f"{geo}/pages.parquet")
    if replicate > 1:
        pages = (
            pages.withColumn(
                "__r", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1)))
            )
            .withColumn(
                "url", F.concat(F.col("url"), F.lit("#r"), F.col("__r").cast("string"))
            )
            .withColumn(
                "text",
                F.concat(F.col("text"), F.lit(" #r"), F.col("__r").cast("string")),
            )
            .drop("__r")
        )
    n = pages.count()  # warm the scan + JVM
    stats = {}

    def run() -> None:
        raster = rasterize_counts(geoparse_pages(pages))
        # persist: the raster feeds BOTH the focal window and the hotspot
        # vectorization (same reuse the registry queries get via the
        # harness); it is pixel-grid-sized, bounded by the coordinate
        # domain, not by the page count — safe to cache at any scale
        raster = raster.persist()
        focal = focal_stats(raster)
        row = focal.select(
            F.bit_xor(F.xxhash64("cell", "focal_sum", "focal_mean")).alias("chk"),
            F.count("*").alias("px"),
        ).collect()[0]
        stats["pixels"] = row["px"]
        hot = vectorize_threshold(raster, threshold=50 * max(replicate, 1))
        hot.select(
            F.bit_xor(F.xxhash64("cell", "value", "lat_min", "lon_min")).alias("chk"),
            F.count("*").alias("rows"),
        ).collect()
        raster.unpersist()

    run()  # warm (codegen + AQE planning)
    spark.catalog.clearCache()
    sec = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        sec = min(sec, time.perf_counter() - t0)
        spark.catalog.clearCache()
    spark.stop()
    print(
        json.dumps(
            {
                "cores": cores,
                "sec": round(sec, 3),
                "pages": n,
                "pixels": stats["pixels"],
            }
        )
    )


if __name__ == "__main__":
    main()
