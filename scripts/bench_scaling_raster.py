"""Raster↔vector scaling harness — mirrors bench_scaling.py's protocol
(fresh JVM per run, interleaved 8/32 ordering, cooldowns, best-of-R,
same-window calibration kernel) for the raster workload measured by
scripts/scaling_raster.py.

One ceiling, like the flagship/kNN evidence: the raster pipeline is
scan/agg-bound (geoparse scan + map-side-combinable pixel groupBy onto
a domain-bounded key space + in-plan 3x3 neighbor explode), so the
pure-JVM CPU kernel is the matching calibration; its only exchange
carries the pixel grid, which is bounded by the coordinate domain and
does not grow with the page count.

Writes BENCH_SCALING_RASTER.json and prints one JSON line.
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

REPLICATE = int(os.environ.get("SCALING_RASTER_REPLICATE", "8"))


def main() -> None:
    kernel_path = "/tmp/scaling_kernel.py"
    with open(kernel_path, "w") as f:
        f.write(KERNEL)

    best: dict[tuple[str, int], float] = {}
    pages = pixels = None
    for r in range(RUNS):
        order = (CORES_BIG, CORES_SMALL) if r % 2 == 0 else (CORES_SMALL, CORES_BIG)
        for cores in order:
            k = run_json([sys.executable, kernel_path, str(cores), str(KERNEL_ROWS)])
            best[("kernel", cores)] = min(best.get(("kernel", cores), 1e9), k["sec"])
            time.sleep(COOLDOWN_S)
            d = run_json(
                [sys.executable, "/root/repo/scripts/scaling_raster.py",
                 str(cores), str(REPLICATE)],
                timeout=1800,
            )
            pages, pixels = d["pages"], d["pixels"]
            best[("raster", cores)] = min(best.get(("raster", cores), 1e9), d["sec"])
            print(
                f"run {r} cores {cores}: kernel {k['sec']}s raster {d['sec']}s",
                file=sys.stderr,
            )
            time.sleep(COOLDOWN_S)

    factor = CORES_BIG / CORES_SMALL
    raw = best[("raster", CORES_SMALL)] / best[("raster", CORES_BIG)] / factor
    ceiling = best[("kernel", CORES_SMALL)] / best[("kernel", CORES_BIG)] / factor
    summary = {
        "metric": f"raster_scaling_efficiency_{CORES_SMALL}_to_{CORES_BIG}",
        "value": round(raw / ceiling, 3),
        "unit": "ratio",
        "raw_efficiency": round(raw, 3),
        "host_ceiling_efficiency": round(ceiling, 3),
        "normalized_efficiency": round(raw / ceiling, 3),
        "raster_sec_small": best[("raster", CORES_SMALL)],
        "raster_sec_big": best[("raster", CORES_BIG)],
        "kernel_sec_small": best[("kernel", CORES_SMALL)],
        "kernel_sec_big": best[("kernel", CORES_BIG)],
        "throughput_small_pages_per_sec": round(pages / best[("raster", CORES_SMALL)], 1),
        "throughput_big_pages_per_sec": round(pages / best[("raster", CORES_BIG)], 1),
        "n_pages": pages,
        "n_pixels": pixels,
        "replicate": REPLICATE,
        "note": (
            "sixth-workload scaling evidence: the raster<->vector family "
            "(geoparse -> rasterize_counts per-pixel groupBy -> 3x3 focal "
            "window via in-plan neighbor explode -> checksum, plus "
            "vectorize_threshold hotspot extraction over the same raster) "
            "at local[8] vs local[32] on 8x in-plan-replicated pages. "
            "Replication grows the scan/geoparse volume and densifies "
            "per-pixel counts while the pixel-grid cardinality stays "
            "bounded by the coordinate domain — the production shape. "
            "Same-window pure-JVM CPU kernel as the ceiling."
        ),
    }
    with open("/root/repo/BENCH_SCALING_RASTER.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
