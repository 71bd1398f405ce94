"""One timed crawl-curation run for the scaling harness (second workload
beside scripts/scaling_flagship.py — evidences that the curation surface,
not just the spatial flagship, scales between cluster sizes).

Usage: python scripts/scaling_curation.py <cores> <replicate>

Reads the sf0.1 crawl fixture and replicates it <replicate>x IN-PLAN with
per-copy url AND host variation (`https://r<N>x.<host>/...#r<N>`): a
bigger crawl means more hosts, not just more snapshots per host, so the
host-keyed stages (blocklist reduce, per-host cap window) scale their key
cardinality with the factor instead of Amdahl-capping at the fixture's 16
hosts. Text varies per copy too, so the md5/gate scan work scales. Runs
the exact q_crawl_curation composition (snapshot dedup → admission gate →
blocklist → per-host cap → canonical key) and prints one JSON line
{"cores": N, "sec": t, "pages": n}. Fresh JVM per invocation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", str(1 * 1024 * 1024))

from pyspark.sql import functions as F  # noqa: E402

from socialmapper_spark.fixtures import ensure_crawl_fixture  # noqa: E402
from socialmapper_spark.operators.web import (  # noqa: E402
    admission_gate,
    blocklist_filter,
    canonical_url,
    per_host_cap,
    snapshot_dedup,
)
from socialmapper_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    crawl_dir = str(ensure_crawl_fixture("/root/testdata/sf0.1"))
    spark = get_spark(
        app_name=f"scaling-curation-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(2 * cores, 16),
    )
    pages = spark.read.parquet(f"{crawl_dir}/crawl_pages.parquet")
    if replicate > 1:
        pages = (
            pages.withColumn(
                "__r", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1)))
            )
            .withColumn(
                "url",
                F.concat(
                    F.lit("https://r"),
                    F.col("__r").cast("string"),
                    F.lit("x."),
                    F.expr("substring(url, 9)"),  # drop 'https://'
                ),
            )
            .withColumn(
                "text", F.concat(F.col("text"), F.lit(" r"), F.col("__r").cast("string"))
            )
            .drop("__r")
        )
    n = pages.count()  # warm scan + JVM

    def run() -> None:
        d = snapshot_dedup(pages)
        kept = admission_gate(
            d, min_chars=122, min_words=23, max_digit_ratio=0.05
        ).filter("keep").select("url")
        bl = spark.createDataFrame(
            [("host3.example.org",), ("host13.example.org",)], "domain string"
        )
        unblocked = blocklist_filter(d, bl).filter(
            F.col("blocked_by").isNull()
        ).select("url")
        admitted = d.select("url").join(kept, "url").join(unblocked, "url")
        capped = per_host_cap(admitted, k=50)
        capped.select(
            "url", "host", "host_rank", canonical_url(F.col("url")).alias("canonical")
        ).count()

    run()  # warm (codegen + AQE)
    spark.catalog.clearCache()
    sec = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        sec = min(sec, time.perf_counter() - t0)
        spark.catalog.clearCache()
    spark.stop()
    print(json.dumps({"cores": cores, "sec": round(sec, 3), "pages": n}))


if __name__ == "__main__":
    main()
