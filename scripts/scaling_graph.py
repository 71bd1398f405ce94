"""One timed PageRank run for the scaling harness (eleventh workload —
evidences the r5 iterative graph-rank family, operators/graph.py, whose
profile no other workload covers: T synchronous rounds, each ONE hash
join of a static weighted-edge table with the evolving rank table plus
ONE integer sum, lineage truncated by eager localCheckpoints).

Usage: python scripts/scaling_graph.py <cores> <n_nodes>

Fixture: a deterministic synthetic skewed link graph written once to
/tmp and shared by both core counts (outside every timed window). Each
node i in [0, n) emits two out-edges into a 4096-hub space
((i*31+7) mod 4096 and (i*131+29) mod 4096) — the same derivation as the
registry's item_pagerank, scaled up: the join key (src) is uniform, the
aggregation key (dst) is hot (4096 hubs absorb 2n in-edges) but
map-side-combinable, the web link-graph norm. count() is a fine sink
HERE: the per-round eager checkpoints force full materialization of
every rank table regardless of final-projection pruning. Fresh JVM per
invocation; prints one JSON line {"cores": N, "sec": t, "edges": m}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", str(4 * 1024 * 1024))

from pyspark.sql import functions as F  # noqa: E402

from socialmapper_spark.operators.graph import pagerank  # noqa: E402
from socialmapper_spark.session import get_spark  # noqa: E402

HUBS = 4096


def ensure_fixture(spark, n_nodes: int) -> str:
    path = f"/tmp/scaling_graph_edges_n{n_nodes}.parquet"
    marker = f"{path}/_SUCCESS"
    if os.path.exists(marker):
        return path
    edges = spark.range(n_nodes).select(
        F.col("id").alias("src"),
        F.explode(
            F.array(
                F.pmod(F.col("id") * 31 + 7, F.lit(HUBS)),
                F.pmod(F.col("id") * 131 + 29, F.lit(HUBS)),
            )
        ).alias("dst"),
    )
    # many files so the scan parallelizes at any core count
    edges.repartition(64).write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    cores = int(sys.argv[1])
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    spark = get_spark(
        app_name=f"scaling-graph-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(2 * cores, 16),
    )
    path = ensure_fixture(spark, n_nodes)
    edges = spark.read.parquet(path)
    m = edges.count()  # warm scan + JVM

    def run() -> None:
        pagerank(edges).count()

    run()  # warm (codegen + AQE)
    spark.catalog.clearCache()
    sec = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        sec = min(sec, time.perf_counter() - t0)
        spark.catalog.clearCache()
    spark.stop()
    print(json.dumps({"cores": cores, "sec": round(sec, 3), "edges": m}))


if __name__ == "__main__":
    main()
