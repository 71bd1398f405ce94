"""One timed unigram-familiarity run for the scaling harness (tenth
workload — evidences the r5 LM quality scorer, operators/lm.py, whose
profile is distinct from the curation funnel's: explode → two
map-side-combinable aggregates over a persisted (doc, token) frame →
term-dictionary join → per-doc aggregate).

Usage: python scripts/scaling_lm.py <cores> <replicate>

Reuses scaling_corpus.py's replicated documents fixture (per-copy
doc_id offset AND text variation — the appended " r<i>" token makes the
term dictionary grow with the factor, so key cardinality scales with
the data, the operator's scale contract). Checksum sink over all output
columns: the scorer filters nothing, so count() would prune the token
math. Fresh JVM per invocation; prints one JSON line
{"cores": N, "sec": t, "docs": n}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", str(1 * 1024 * 1024))

from pyspark.sql import functions as F  # noqa: E402

from socialmapper_spark.operators.lm import unigram_familiarity  # noqa: E402
from socialmapper_spark.session import get_spark, release_caches  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(
        app_name=f"scaling-lm-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(2 * cores, 16),
    )
    from scaling_corpus import ensure_fixture  # noqa: E402

    path = ensure_fixture(spark, replicate)
    docs = spark.read.parquet(path)
    n = docs.count()  # warm scan + JVM

    def run() -> None:
        out = unigram_familiarity(docs)
        out.select(
            F.bit_xor(F.xxhash64(*[F.col(c) for c in out.columns]))
        ).collect()
        # the operator persists its (doc, token) aggregate; release it so
        # the next run re-measures the full pipeline
        release_caches(out)

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
