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
import os as _os
_os.environ.setdefault('SPARK_GRAFT_MAX_PARTITION_BYTES', str(1*1024*1024))
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
        # in-plan row multiplication: ONE plan branch regardless of the
        # factor (a per-copy union makes an 8-branch plan whose serial
        # driver-side planning/codegen time Amdahl-caps the measured
        # scaling ratio at any core count). Distinct urls per copy keep
        # the per-url aggregation cardinality scaling too.
        # vary BOTH url and text per copy: url keeps per-url aggregation
        # cardinality scaling, and the text suffix stops Catalyst from
        # (correctly!) hoisting the geoparse projection above the explode
        # — otherwise the regex work would not scale with the factor. The
        # "#rN" suffix cannot introduce a coordinate or gazetteer match.
        pages = (
            pages.withColumn(
                "__r", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1)))
            )
            .withColumn(
                "url", F.concat(F.col("url"), F.lit("#r"), F.col("__r").cast("string"))
            )
            .withColumn(
                "text", F.concat(F.col("text"), F.lit(" #r"), F.col("__r").cast("string"))
            )
            .drop("__r")
        )
    polygons = spark.read.parquet(f"{geo}/polygons.parquet")
    census = spark.read.parquet(f"{geo}/census_long.parquet")
    n = pages.count()  # warm the scan + JVM
    # warm run (codegen + AQE planning), then best-of-2 timed runs: the
    # north rule is about sustained throughput scaling, not first-query
    # compilation latency. flagship_query persists an intermediate whose
    # CacheManager entry is keyed by logical plan and would be REUSED by
    # the next identical query — clear it so every timed run executes the
    # full pipeline.
    flagship_query(spark, pages, polygons, census).collect()
    spark.catalog.clearCache()
    sec = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        flagship_query(spark, pages, polygons, census).collect()
        sec = min(sec, time.perf_counter() - t0)
        spark.catalog.clearCache()
    spark.stop()
    print(json.dumps({"cores": cores, "sec": round(sec, 3), "pages": n}))


if __name__ == "__main__":
    main()
