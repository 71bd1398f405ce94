"""Unigram-familiarity scaling harness — mirrors bench_scaling.py's
protocol (fresh JVM per run, interleaved 8/32 ordering, cooldowns,
best-of-R, same-window calibration kernel) for the workload measured by
scripts/scaling_lm.py (the r5 LM quality scorer over the 64x replicated
multi-split documents fixture).

One CPU-kernel ceiling: the dominant stages are the explode + the two
map-side-combinable hash aggregates (expression/CPU-bound); the single
term-dictionary join moves one row per distinct (doc, token), far less
than the dedup family's multi-exchange profile that justified a second
shuffle kernel there.

Writes BENCH_SCALING_LM.json and prints one JSON line.
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

REPLICATE = int(os.environ.get("SCALING_LM_REPLICATE", "256"))


def main() -> None:
    kernel_path = "/tmp/scaling_kernel.py"
    with open(kernel_path, "w") as f:
        f.write(KERNEL)

    best: dict[tuple[str, int], float] = {}
    docs = None
    for r in range(RUNS):
        order = (CORES_BIG, CORES_SMALL) if r % 2 == 0 else (CORES_SMALL, CORES_BIG)
        for cores in order:
            k = run_json([sys.executable, kernel_path, str(cores), str(KERNEL_ROWS)])
            best[("kernel", cores)] = min(best.get(("kernel", cores), 1e9), k["sec"])
            time.sleep(COOLDOWN_S)
            c = run_json(
                [sys.executable, "/root/repo/scripts/scaling_lm.py",
                 str(cores), str(REPLICATE)]
            )
            docs = c["docs"]
            best[("lm", cores)] = min(best.get(("lm", cores), 1e9), c["sec"])
            print(f"run {r} cores {cores}: kernel {k['sec']}s lm {c['sec']}s",
                  file=sys.stderr)
            time.sleep(COOLDOWN_S)

    factor = CORES_BIG / CORES_SMALL
    raw = best[("lm", CORES_SMALL)] / best[("lm", CORES_BIG)] / factor
    ceiling = best[("kernel", CORES_SMALL)] / best[("kernel", CORES_BIG)] / factor
    summary = {
        "metric": f"lm_scaling_efficiency_{CORES_SMALL}_to_{CORES_BIG}",
        "value": round(raw / ceiling, 3),
        "unit": "ratio",
        "raw_efficiency": round(raw, 3),
        "host_ceiling_efficiency": round(ceiling, 3),
        "normalized_efficiency": round(raw / ceiling, 3),
        "lm_sec_small": best[("lm", CORES_SMALL)],
        "lm_sec_big": best[("lm", CORES_BIG)],
        "kernel_sec_small": best[("kernel", CORES_SMALL)],
        "kernel_sec_big": best[("kernel", CORES_BIG)],
        "throughput_small_docs_per_sec": round(docs / best[("lm", CORES_SMALL)], 1),
        "throughput_big_docs_per_sec": round(docs / best[("lm", CORES_BIG)], 1),
        "n_docs": docs,
        "replicate": REPLICATE,
        "note": (
            "tenth-workload scaling evidence: the r5 corpus-unigram LM "
            "quality scorer (explode -> persisted (doc, token) aggregate -> "
            "term-dictionary join -> per-doc aggregate) at local[8] vs "
            f"local[32] on the {REPLICATE}x replicated multi-split documents fixture "
            "(per-copy text variation grows the term dictionary, so key "
            "cardinality scales with the data). normalized = lm 8->32 "
            "speedup / same-window pure-JVM CPU-kernel speedup; >=0.8 "
            "normalized means the engine adds no scaling bottleneck."
        ),
    }
    with open("/root/repo/BENCH_SCALING_LM.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
