"""Corpus-curation scaling harness (r4 VERDICT task 5) — mirrors
scripts/bench_scaling.py's protocol (fresh JVM per run, interleaved
8/32 ordering, cooldowns, best-of-R, same-window CPU calibration kernel)
for the document-side funnel measured by scripts/scaling_corpus.py.

Writes BENCH_SCALING_CORPUS.json and prints one JSON line. See
bench_scaling.py's module docstring for why normalized-vs-kernel is the
engine-attributable number on this shared-tenancy VM.
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

REPLICATE = int(os.environ.get("SCALING_CORPUS_REPLICATE", "64"))


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
                [sys.executable, "/root/repo/scripts/scaling_corpus.py",
                 str(cores), str(REPLICATE)]
            )
            docs = c["docs"]
            best[("corpus", cores)] = min(best.get(("corpus", cores), 1e9), c["sec"])
            print(f"run {r} cores {cores}: kernel {k['sec']}s corpus {c['sec']}s",
                  file=sys.stderr)
            time.sleep(COOLDOWN_S)

    factor = CORES_BIG / CORES_SMALL
    raw = best[("corpus", CORES_SMALL)] / best[("corpus", CORES_BIG)] / factor
    ceiling = best[("kernel", CORES_SMALL)] / best[("kernel", CORES_BIG)] / factor
    summary = {
        "metric": f"corpus_scaling_efficiency_{CORES_SMALL}_to_{CORES_BIG}",
        "value": round(raw / ceiling, 3),
        "unit": "ratio",
        "raw_efficiency": round(raw, 3),
        "host_ceiling_efficiency": round(ceiling, 3),
        "normalized_efficiency": round(raw / ceiling, 3),
        "corpus_sec_small": best[("corpus", CORES_SMALL)],
        "corpus_sec_big": best[("corpus", CORES_BIG)],
        "kernel_sec_small": best[("kernel", CORES_SMALL)],
        "kernel_sec_big": best[("kernel", CORES_BIG)],
        "throughput_small_docs_per_sec": round(docs / best[("corpus", CORES_SMALL)], 1),
        "throughput_big_docs_per_sec": round(docs / best[("corpus", CORES_BIG)], 1),
        "n_docs": docs,
        "replicate": REPLICATE,
        "note": (
            "third-workload scaling evidence: the 6-stage document curation "
            "funnel (language -> quality -> repetition -> decontaminate -> "
            "sample -> PII scrub) at local[8] vs local[32] on the 64x "
            "replicated multi-split documents fixture (text varied per copy "
            "so scan work scales). normalized = corpus 8->32 speedup / "
            "same-window pure-JVM CPU-kernel speedup; the funnel is "
            "scan-side-dominated (one doc_id join), so the CPU kernel is "
            "the physically-matching ceiling. >=0.8 normalized means the "
            "engine adds no scaling bottleneck."
        ),
    }
    with open("/root/repo/BENCH_SCALING_CORPUS.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
