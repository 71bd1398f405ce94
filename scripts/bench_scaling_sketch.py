"""Mergeable-sketch scaling harness — mirrors bench_scaling.py's
protocol (fresh JVM per run, interleaved 8/32 ordering, cooldowns,
best-of-R, same-window calibration kernel) for the workload measured by
scripts/scaling_sketch.py (the r5 deterministic HLL + count-min build
over the in-plan-replicated sf0.1 crawl fixture).

One CPU-kernel ceiling: the dominant stages are the md5-60 hash
projection and the map-side-combinable register max / counter sum —
hash+aggregate CPU work, the exact physical shape of the calibration
kernel (md5+xxhash fold over spark.range). The register exchange
carries at most 2^p rows per host however large the input, so no
shuffle kernel is relevant here.

Writes BENCH_SCALING_SKETCH.json and prints one JSON line.
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

REPLICATE = int(os.environ.get("SCALING_SKETCH_REPLICATE", "64"))


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
            c = run_json(
                [sys.executable, "/root/repo/scripts/scaling_sketch.py",
                 str(cores), str(REPLICATE)]
            )
            pages = c["pages"]
            best[("sketch", cores)] = min(best.get(("sketch", cores), 1e9), c["sec"])
            print(f"run {r} cores {cores}: kernel {k['sec']}s sketch {c['sec']}s",
                  file=sys.stderr)
            time.sleep(COOLDOWN_S)

    factor = CORES_BIG / CORES_SMALL
    raw = best[("sketch", CORES_SMALL)] / best[("sketch", CORES_BIG)] / factor
    ceiling = best[("kernel", CORES_SMALL)] / best[("kernel", CORES_BIG)] / factor
    summary = {
        "metric": f"sketch_scaling_efficiency_{CORES_SMALL}_to_{CORES_BIG}",
        "value": round(raw / ceiling, 3),
        "unit": "ratio",
        "raw_efficiency": round(raw, 3),
        "host_ceiling_efficiency": round(ceiling, 3),
        "normalized_efficiency": round(raw / ceiling, 3),
        "sketch_sec_small": best[("sketch", CORES_SMALL)],
        "sketch_sec_big": best[("sketch", CORES_BIG)],
        "kernel_sec_small": best[("kernel", CORES_SMALL)],
        "kernel_sec_big": best[("kernel", CORES_BIG)],
        "throughput_small_pages_per_sec": round(pages / best[("sketch", CORES_SMALL)], 1),
        "throughput_big_pages_per_sec": round(pages / best[("sketch", CORES_BIG)], 1),
        "n_pages": pages,
        "replicate": REPLICATE,
        "note": (
            "thirteenth-workload scaling evidence: the r5 mergeable-sketch "
            "family (deterministic HLL registers+estimate keyed (host, idx) "
            "plus the 4x2048 count-min table) at local[8] vs local[32] on "
            f"the {REPLICATE}x in-plan-replicated sf0.1 crawl fixture "
            "(per-copy host AND text variation grows both the group count "
            "and the per-group distinct-key count with the factor). "
            "normalized = sketch 8->32 speedup / same-window pure-JVM "
            "CPU-kernel speedup; >=0.8 normalized means the engine adds no "
            "scaling bottleneck."
        ),
    }
    with open("/root/repo/BENCH_SCALING_SKETCH.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
