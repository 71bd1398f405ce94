"""One timed corpus-curation run for the scaling harness (third workload
beside scaling_flagship.py and scaling_curation.py — evidences that the
DOCUMENT-side funnel, not just the crawl/spatial surfaces, scales between
cluster sizes; r4 VERDICT task 5).

Usage: python scripts/scaling_corpus.py <cores> <replicate>

The sf0.1 documents fixture is 5,000 rows in ONE parquet row group — a
row group is Spark's minimum split unit, so timing it directly measures
one core. Production corpora arrive in many splits, so a prep step (once
per replicate factor, shared by both core counts, outside every timed
window) materializes a <replicate>x copy to /tmp with per-copy doc_id
offset AND text variation (the md5/gate/n-gram scan work scales with the
factor, not just the row count) written as many files. The timed run is
the exact corpus_curation_frame composition (language gate → quality →
repetition → decontaminate → stratified sample → PII scrub) ending in
count(). Fresh JVM per invocation; prints one JSON line
{"cores": N, "sec": t, "docs": n}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", str(1 * 1024 * 1024))

from pyspark.sql import functions as F  # noqa: E402

from socialmapper_spark.session import get_spark  # noqa: E402


def ensure_fixture(spark, replicate: int) -> str:
    path = f"/tmp/scaling_corpus_docs_r{replicate}.parquet"
    marker = f"{path}/_SUCCESS"
    if os.path.exists(marker):
        return path
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    big = (
        docs.withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1)))
        )
        # offset keeps doc_id unique per copy; text varies per copy so the
        # scan-side gate/n-gram work scales with the factor
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
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(
        app_name=f"scaling-corpus-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(2 * cores, 16),
    )
    import __spark_entry__ as entrymod

    path = ensure_fixture(spark, replicate)
    docs = spark.read.parquet(path)
    n = docs.count()  # warm scan + JVM

    def run() -> None:
        # checksum sink over every output column: the funnel filters
        # nothing, so under count() Catalyst would prune every text
        # expression and this would time a join of doc_ids (see
        # bench.py checksum_all)
        out = entrymod.corpus_curation_frame(docs)
        out.select(
            F.bit_xor(F.xxhash64(*[F.col(c) for c in out.columns]))
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
    print(json.dumps({"cores": cores, "sec": round(sec, 3), "docs": n}))


if __name__ == "__main__":
    main()
