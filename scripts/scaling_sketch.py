"""One timed sketch-build run for the scaling harness (thirteenth
workload — evidences the r5 mergeable-sketch family, operators/
sketch.py: deterministic HLL registers + estimate AND the count-min
table over the same scan).

Usage: python scripts/scaling_sketch.py <cores> <replicate>

Reads the sf0.1 crawl fixture and replicates it <replicate>x IN-PLAN
with per-copy host AND text variation (the scaling_curation.py
pattern): a bigger crawl means more hosts (more HLL groups — group
cardinality scales with the factor, the operator's scale contract) and
more distinct snapshot texts (more distinct md5-60 keys per group, so
the register max-agg sees new values, not repeats). Workload profile:
scan → md5-60 hash projection → map-side-combinable max keyed
(host, idx) → per-host estimate agg, plus the 4x2048 count-min integer
sum over the same frame — hash+aggregate CPU work end to end, the same
physical shape as the calibration kernel. Checksum sink over all
output columns (the estimate is one row per host; count() would prune
the register math). Fresh JVM per invocation; prints one JSON line
{"cores": N, "sec": t, "pages": n}.
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
from socialmapper_spark.operators.sketch import (  # noqa: E402
    cms_sketch,
    hll_cardinality,
)
from socialmapper_spark.operators.web import page_host  # noqa: E402
from socialmapper_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    crawl_dir = str(ensure_crawl_fixture("/root/testdata/sf0.1"))
    spark = get_spark(
        app_name=f"scaling-sketch-{cores}", master=f"local[{cores}]",
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
                    F.expr("substring(url, 9)"),
                ),
            )
            .withColumn(
                "text",
                F.concat(F.col("text"), F.lit(" r"), F.col("__r").cast("string")),
            )
            .drop("__r")
        )
    keyed = pages.select(page_host(F.col("url")).alias("host"), "text")
    n = pages.count()  # warm scan + JVM

    def run() -> None:
        est = hll_cardinality(keyed, "text", ("host",), p=8)
        est.select(
            F.bit_xor(F.xxhash64(*[F.col(c) for c in est.columns]))
        ).collect()
        cms = cms_sketch(keyed.select("host"), "host")
        cms.select(
            F.bit_xor(F.xxhash64(*[F.col(c) for c in cms.columns]))
        ).collect()

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
