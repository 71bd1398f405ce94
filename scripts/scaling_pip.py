"""One timed PIP-assignment run for the scaling harness (seventh
workload — the literal second component of BASELINE.json's metric,
"PIP assignments/sec", measured WITHOUT the flagship's demographic
aggregation tail so the number is the join itself).

Usage: python scripts/scaling_pip.py <cores> <replicate>

Pipeline under test (the exact pip_assignments registry composition):
geoparse pages → H3-style cell encode → two-phase spatial join
(cell-prefilter against the broadcast polygon cover, exact pure-Catalyst
even-odd ray cast refine over pre-parsed edge arrays) → (url, poly_id,
GEOID, kind) checksum. The polygon side stays fixed while pages
replicate — the production shape (a continental polygon table vs a
web-scale probe side); the broadcast never grows with the probe.

Fixture: sf0.1 geo pages replicated <replicate>x IN-PLAN (per-copy url
and text variation, same rationale as scaling_flagship.py). Fresh JVM
per invocation; prints one JSON line
{"cores": N, "sec": t, "pages": n, "assignments": a}.
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
from socialmapper_spark.pipeline import page_assignments  # noqa: E402
from socialmapper_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    geo = str(geo_dir_for("/root/testdata/sf0.1"))
    spark = get_spark(
        app_name=f"scaling-pip-{cores}", master=f"local[{cores}]",
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
    polygons = spark.read.parquet(f"{geo}/polygons.parquet")
    n = pages.count()  # warm the scan + JVM
    stats = {}

    def run() -> None:
        out = page_assignments(spark, pages, polygons)
        # checksum sink over the full output: count() would let Catalyst
        # prune the refine math (see bench.py checksum_all)
        row = out.select(
            F.bit_xor(F.xxhash64("url", "poly_id", "GEOID", "kind")).alias("chk"),
            F.count("*").alias("rows"),
        ).collect()[0]
        stats["assignments"] = row["rows"]

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
                "assignments": stats["assignments"],
            }
        )
    )


if __name__ == "__main__":
    main()
