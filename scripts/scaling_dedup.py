"""One timed near-dup-pipeline run for the scaling harness (fourth
workload beside scaling_flagship.py / scaling_curation.py /
scaling_corpus.py — evidences that the SHUFFLE-HEAVY dedup family, not
just the scan-dominated funnels, scales between cluster sizes).

Usage: python scripts/scaling_dedup.py <cores> <replicate>

Pipeline under test (the exact dedup_groups registry composition):
minhash signatures (16 perms, Catalyst-only) → 4-band LSH banding
groupBy → capped bucket pair explosion → exact shingle-Jaccard verify
join → hash-min connected components (iterative join + localCheckpoint
rounds) → (doc_id, group_id, is_canonical) checksum. Three wide
exchanges plus the CC iterations — the heaviest shuffle profile in the
repo, which is exactly why it gets its own two-cluster-size evidence.

Fixture: the sf0.1 documents table replicated <replicate>x with per-copy
doc_id offset and per-copy text variation (" r<N>" suffix). Copies of
one base doc are ~0.95-Jaccard near-dups, so every base doc becomes one
R-sized near-dup cluster: candidate pairs scale as R^2 per cluster and
CC nodes as R — the shuffle volume, not just the scan volume, grows
with the factor. Materialized once per factor to /tmp as 64 row groups
(shared by both core counts, outside every timed window) so the scan
parallelizes at any core count. Fresh JVM per invocation; prints one
JSON line {"cores": N, "sec": t, "docs": n, "pairs": p, "groups": g}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", str(1 * 1024 * 1024))

from pyspark.sql import functions as F  # noqa: E402

from socialmapper_spark.operators.dedup import (  # noqa: E402
    dedup_groups,
    jaccard_verify,
    near_dup_pairs_minhash,
)
from socialmapper_spark.session import get_spark  # noqa: E402


def ensure_fixture(spark, replicate: int) -> str:
    path = f"/tmp/scaling_dedup_docs_r{replicate}.parquet"
    marker = f"{path}/_SUCCESS"
    if os.path.exists(marker):
        return path
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    big = (
        docs.withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1)))
        )
        # offset keeps doc_id unique per copy; the " r<N>" suffix keeps
        # copies NEAR-dups (not exact dups), so the pipeline exercises
        # the LSH+verify path rather than degenerate identical buckets
        .withColumn("doc_id", F.col("doc_id") + F.col("__r") * F.lit(1_000_000))
        .withColumn(
            "text",
            F.concat(F.col("text"), F.lit(" r"), F.col("__r").cast("string")),
        )
        .drop("__r")
    )
    big.repartition(64).write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    cores = int(sys.argv[1])
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(
        app_name=f"scaling-dedup-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(2 * cores, 16),
    )
    path = ensure_fixture(spark, replicate)
    docs = spark.read.parquet(path).select("doc_id", "text")
    n = docs.count()  # warm scan + JVM

    stats = {}

    def run() -> None:
        pairs = near_dup_pairs_minhash(docs)
        verified = jaccard_verify(docs, pairs, threshold=0.3)
        groups = dedup_groups(verified.select("doc_a", "doc_b"), docs=docs)
        # checksum sink over every output column: count() would let
        # Catalyst prune the group computation (see bench.py checksum_all)
        row = groups.select(
            F.bit_xor(
                F.xxhash64("doc_id", "group_id", "is_canonical")
            ).alias("chk"),
            F.count("*").alias("rows"),
            F.count_distinct("group_id").alias("groups"),
        ).collect()[0]
        stats["groups"] = row["groups"]

    run()  # warm (codegen + AQE)
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
                "docs": n,
                "groups": stats["groups"],
            }
        )
    )


if __name__ == "__main__":
    main()
