"""Near-dup-pipeline scaling harness — mirrors bench_scaling_corpus.py's
protocol (fresh JVM per run, interleaved 8/32 ordering, cooldowns,
best-of-R, same-window calibration kernels) for the shuffle-heavy dedup
workload measured by scripts/scaling_dedup.py.

TWO ceilings, like the curation evidence: the CPU kernel (md5+xxhash
scan, no shuffle) bounds the signature/shingle scan stages; a SHUFFLE
kernel with the pipeline's dominant exchange shape (hash agg over
~n/8-cardinality string keys carrying a ~300-byte payload, zero engine
code) bounds the banding/verify exchanges. On this single-disk VM the
shuffle kernel historically scales far WORSE than the CPU kernel
(BENCH_SCALING_CURATION.json: 0.178 vs 0.431 raw), so a dedup raw
efficiency between the two ceilings means the engine sits where its
stage mix physically must — the box, not the plan, is the limit.

Writes BENCH_SCALING_DEDUP.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo/scripts")

from bench_scaling import (  # noqa: E402
    COOLDOWN_S,
    CORES_BIG,
    CORES_SMALL,
    KERNEL,
    KERNEL_ROWS,
    RUNS,
    run_json,
)

REPLICATE = int(os.environ.get("SCALING_DEDUP_REPLICATE", "16"))

# Pure-JVM shuffle kernel shaped like the dedup pipeline's dominant
# exchanges: string-keyed hash agg, ~n/8 key cardinality, ~300-byte
# payload per row (a base doc's text / a shingle array's bytes). No
# socialmapper_spark code — this times what the BOX does to any shuffle
# of this shape.
SHUFFLE_KERNEL = """
import sys, time, json
from pyspark.sql import SparkSession, functions as F
cores, n = int(sys.argv[1]), int(sys.argv[2])
spark = (SparkSession.builder.master(f"local[{cores}]")
  .config("spark.ui.enabled","false").config("spark.driver.memory","8g")
  .config("spark.sql.shuffle.partitions", str(max(2*cores, 16))).getOrCreate())
df = (spark.range(0, n, 1, numPartitions=cores*4)
  .withColumn("key", F.md5((F.col("id") % (n // 8)).cast("string")))
  .withColumn("payload", F.repeat(F.md5(F.col("id").cast("string")), 10)))
df.count()
t0 = time.perf_counter()
(df.groupBy("key")
   .agg(F.count("*").alias("c"), F.min("payload").alias("m"))
   .select(F.bit_xor(F.xxhash64("key", "c", "m"))).collect())
print(json.dumps({"cores": cores, "sec": round(time.perf_counter()-t0, 3)}))
spark.stop()
"""

SHUFFLE_KERNEL_ROWS = int(os.environ.get("SCALING_SHUFFLE_ROWS", "6000000"))


def main() -> None:
    kernel_path = "/tmp/scaling_kernel.py"
    with open(kernel_path, "w") as f:
        f.write(KERNEL)
    shuffle_path = "/tmp/scaling_shuffle_kernel.py"
    with open(shuffle_path, "w") as f:
        f.write(SHUFFLE_KERNEL)

    best: dict[tuple[str, int], float] = {}
    docs = groups = None
    for r in range(RUNS):
        order = (CORES_BIG, CORES_SMALL) if r % 2 == 0 else (CORES_SMALL, CORES_BIG)
        for cores in order:
            k = run_json([sys.executable, kernel_path, str(cores), str(KERNEL_ROWS)])
            best[("kernel", cores)] = min(best.get(("kernel", cores), 1e9), k["sec"])
            time.sleep(COOLDOWN_S)
            s = run_json(
                [sys.executable, shuffle_path, str(cores), str(SHUFFLE_KERNEL_ROWS)]
            )
            best[("shuffle", cores)] = min(best.get(("shuffle", cores), 1e9), s["sec"])
            time.sleep(COOLDOWN_S)
            d = run_json(
                [sys.executable, "/root/repo/scripts/scaling_dedup.py",
                 str(cores), str(REPLICATE)],
                timeout=1800,
            )
            docs, groups = d["docs"], d["groups"]
            best[("dedup", cores)] = min(best.get(("dedup", cores), 1e9), d["sec"])
            print(
                f"run {r} cores {cores}: kernel {k['sec']}s "
                f"shuffle {s['sec']}s dedup {d['sec']}s",
                file=sys.stderr,
            )
            time.sleep(COOLDOWN_S)

    factor = CORES_BIG / CORES_SMALL
    raw = best[("dedup", CORES_SMALL)] / best[("dedup", CORES_BIG)] / factor
    cpu_ceiling = best[("kernel", CORES_SMALL)] / best[("kernel", CORES_BIG)] / factor
    shuffle_ceiling = (
        best[("shuffle", CORES_SMALL)] / best[("shuffle", CORES_BIG)] / factor
    )
    summary = {
        "metric": f"dedup_scaling_efficiency_{CORES_SMALL}_to_{CORES_BIG}",
        "value": round(raw / cpu_ceiling, 3),
        "unit": "ratio",
        "raw_efficiency": round(raw, 3),
        "host_ceiling_efficiency": round(cpu_ceiling, 3),
        "normalized_efficiency": round(raw / cpu_ceiling, 3),
        "shuffle_kernel_ceiling": round(shuffle_ceiling, 3),
        "dedup_sec_small": best[("dedup", CORES_SMALL)],
        "dedup_sec_big": best[("dedup", CORES_BIG)],
        "kernel_sec_small": best[("kernel", CORES_SMALL)],
        "kernel_sec_big": best[("kernel", CORES_BIG)],
        "shuffle_kernel_sec_small": best[("shuffle", CORES_SMALL)],
        "shuffle_kernel_sec_big": best[("shuffle", CORES_BIG)],
        "throughput_small_docs_per_sec": round(docs / best[("dedup", CORES_SMALL)], 1),
        "throughput_big_docs_per_sec": round(docs / best[("dedup", CORES_BIG)], 1),
        "n_docs": docs,
        "n_groups": groups,
        "replicate": REPLICATE,
        "note": (
            "fourth-workload scaling evidence: the full near-dup pipeline "
            "(minhash 16-perm signatures -> 4-band LSH banding groupBy -> "
            "capped bucket pair join -> exact shingle-Jaccard verify join "
            "-> hash-min connected components) at local[8] vs local[32] on "
            "the 16x replicated documents fixture (copies are ~0.95-Jaccard "
            "near-dups, so pair volume scales R^2; the 16x size amortizes "
            "the CC rounds' fixed per-iteration latency that capped the "
            "earlier 8x run at raw 0.337). TWO same-window "
            "pure-JVM ceilings: the CPU kernel bounds the scan stages, the "
            "shuffle kernel (string-keyed hash agg, 300-byte payload) "
            "bounds the exchanges. A raw efficiency at-or-above the "
            "stage-mix-weighted band between them means the engine adds no "
            "scaling bottleneck beyond the single-disk box itself."
        ),
    }
    with open("/root/repo/BENCH_SCALING_DEDUP.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
