"""One timed flagship run for the scaling harness.

Usage: python scripts/scaling_flagship.py <cores> <replicate>

Reads the sf0.1 geo fixtures, replicates the pages table <replicate>x
in-plan (distinct urls per copy, so per-url aggregation cardinality
scales too), runs the flagship query end to end, prints one JSON line
{"cores": N, "sec": t, "pages": n}. A fresh JVM per invocation — no
warm-cache bleed between configurations.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from socialmapper_spark.fixtures import geo_dir_for  # noqa: E402
from socialmapper_spark.pipeline import flagship_query  # noqa: E402
from socialmapper_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    geo = str(geo_dir_for("/root/testdata/sf0.1"))
    spark = get_spark(
        app_name=f"scaling-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(2 * cores, 16),
    )
    pages = spark.read.parquet(f"{geo}/pages.parquet")
    if replicate > 1:
        copies = [
            pages.withColumn("url", F.concat(F.col("url"), F.lit(f"#r{i}")))
            for i in range(replicate)
        ]
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        pages = big
    polygons = spark.read.parquet(f"{geo}/polygons.parquet")
    census = spark.read.parquet(f"{geo}/census_long.parquet")
    n = pages.count()  # warm the scan + JVM
    t0 = time.perf_counter()
    flagship_query(spark, pages, polygons, census).collect()
    sec = time.perf_counter() - t0
    spark.stop()
    print(json.dumps({"cores": cores, "sec": round(sec, 3), "pages": n}))


if __name__ == "__main__":
    main()
