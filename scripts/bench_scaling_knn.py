"""kNN k-ring scaling harness — mirrors bench_scaling.py's protocol
(fresh JVM per run, interleaved 8/32 ordering, cooldowns, best-of-R,
same-window calibration kernel) for the kNN workload measured by
scripts/scaling_knn.py.

One ceiling, like the flagship evidence: the kNN pipeline is
scan/broadcast-bound (Arrow projection + broadcast candidate join +
one map-side-combinable per-url agg), so the pure-JVM CPU kernel is the
calibration that matches its stage mix; there is no dominant exchange
to justify the dedup harness's second shuffle kernel.

Writes BENCH_SCALING_KNN.json and prints one JSON line.
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

REPLICATE = int(os.environ.get("SCALING_KNN_REPLICATE", "8"))


def main() -> None:
    kernel_path = "/tmp/scaling_kernel.py"
    with open(kernel_path, "w") as f:
        f.write(KERNEL)

    best: dict[tuple[str, int], float] = {}
    pages = None
    for r in range(RUNS):
        order = (CORES_BIG, CORES_SMALL) if r % 2 == 0 else (CORES_SMALL, CORES_BIG)
        for cores in order:
            k = run_json([sys.executable, kernel_path, str(cores), str(KERNEL_ROWS)])
            best[("kernel", cores)] = min(best.get(("kernel", cores), 1e9), k["sec"])
            time.sleep(COOLDOWN_S)
            d = run_json(
                [sys.executable, "/root/repo/scripts/scaling_knn.py",
                 str(cores), str(REPLICATE)],
                timeout=1800,
            )
            pages = d["pages"]
            best[("knn", cores)] = min(best.get(("knn", cores), 1e9), d["sec"])
            print(
                f"run {r} cores {cores}: kernel {k['sec']}s knn {d['sec']}s",
                file=sys.stderr,
            )
            time.sleep(COOLDOWN_S)

    factor = CORES_BIG / CORES_SMALL
    raw = best[("knn", CORES_SMALL)] / best[("knn", CORES_BIG)] / factor
    ceiling = best[("kernel", CORES_SMALL)] / best[("kernel", CORES_BIG)] / factor
    summary = {
        "metric": f"knn_scaling_efficiency_{CORES_SMALL}_to_{CORES_BIG}",
        "value": round(raw / ceiling, 3),
        "unit": "ratio",
        "raw_efficiency": round(raw, 3),
        "host_ceiling_efficiency": round(ceiling, 3),
        "normalized_efficiency": round(raw / ceiling, 3),
        "knn_sec_small": best[("knn", CORES_SMALL)],
        "knn_sec_big": best[("knn", CORES_BIG)],
        "kernel_sec_small": best[("kernel", CORES_SMALL)],
        "kernel_sec_big": best[("kernel", CORES_BIG)],
        "throughput_small_pages_per_sec": round(pages / best[("knn", CORES_SMALL)], 1),
        "throughput_big_pages_per_sec": round(pages / best[("knn", CORES_BIG)], 1),
        "n_pages": pages,
        "replicate": REPLICATE,
        "note": (
            "fifth-workload scaling evidence: the kNN k-ring pipeline "
            "(geoparse -> Albers Arrow projection -> in-plan ring-disk "
            "explode over the broadcast POI table -> left candidate join "
            "-> top-1 per-url agg -> exactness guard + brute-force "
            "fallback) at local[8] vs local[32] on 8x in-plan-replicated "
            "pages (per-copy url+text variation; the POI side stays fixed "
            "— the production shape where the probe side is the one that "
            "grows). Same-window pure-JVM CPU kernel as the ceiling; raw "
            "efficiency at-or-above it means the engine adds no scaling "
            "bottleneck beyond the box."
        ),
    }
    with open("/root/repo/BENCH_SCALING_KNN.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
