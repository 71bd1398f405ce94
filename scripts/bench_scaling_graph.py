"""Iterative graph-rank scaling harness — mirrors bench_scaling.py's
protocol (fresh JVM per run, interleaved 8/32 ordering, cooldowns,
best-of-R, same-window calibration kernel) for the workload measured by
scripts/scaling_graph.py (5 fixed-point PageRank rounds over an 8M-edge
deterministic skewed link graph).

One CPU-kernel ceiling: each round is one shuffle hash join (uniform
src key) plus one integer hash aggregate whose hot 4096-hub key space is
fully map-side-combinable, so the dominant cost is expression/CPU work
with per-round job-boundary latency — the profile the checkpoint-
interval tradeoff in operators/graph.py is tuned for.

Writes BENCH_SCALING_GRAPH.json and prints one JSON line.
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

N_NODES = int(os.environ.get("SCALING_GRAPH_NODES", "4000000"))


def main() -> None:
    kernel_path = "/tmp/scaling_kernel.py"
    with open(kernel_path, "w") as f:
        f.write(KERNEL)

    best: dict[tuple[str, int], float] = {}
    edges = None
    for r in range(RUNS):
        order = (CORES_BIG, CORES_SMALL) if r % 2 == 0 else (CORES_SMALL, CORES_BIG)
        for cores in order:
            k = run_json([sys.executable, kernel_path, str(cores), str(KERNEL_ROWS)])
            best[("kernel", cores)] = min(best.get(("kernel", cores), 1e9), k["sec"])
            time.sleep(COOLDOWN_S)
            c = run_json(
                [sys.executable, "/root/repo/scripts/scaling_graph.py",
                 str(cores), str(N_NODES)]
            )
            edges = c["edges"]
            best[("graph", cores)] = min(best.get(("graph", cores), 1e9), c["sec"])
            print(f"run {r} cores {cores}: kernel {k['sec']}s graph {c['sec']}s",
                  file=sys.stderr)
            time.sleep(COOLDOWN_S)

    factor = CORES_BIG / CORES_SMALL
    raw = best[("graph", CORES_SMALL)] / best[("graph", CORES_BIG)] / factor
    ceiling = best[("kernel", CORES_SMALL)] / best[("kernel", CORES_BIG)] / factor
    summary = {
        "metric": f"graph_scaling_efficiency_{CORES_SMALL}_to_{CORES_BIG}",
        "value": round(raw / ceiling, 3),
        "unit": "ratio",
        "raw_efficiency": round(raw, 3),
        "host_ceiling_efficiency": round(ceiling, 3),
        "normalized_efficiency": round(raw / ceiling, 3),
        "graph_sec_small": best[("graph", CORES_SMALL)],
        "graph_sec_big": best[("graph", CORES_BIG)],
        "kernel_sec_small": best[("kernel", CORES_SMALL)],
        "kernel_sec_big": best[("kernel", CORES_BIG)],
        "throughput_small_edge_rounds_per_sec": round(
            5 * edges / best[("graph", CORES_SMALL)], 1
        ),
        "throughput_big_edge_rounds_per_sec": round(
            5 * edges / best[("graph", CORES_BIG)], 1
        ),
        "n_edges": edges,
        "n_nodes": N_NODES,
        "iterations": 5,
        "note": (
            "eleventh-workload scaling evidence: 5 fixed-point integer "
            "PageRank rounds (operators/graph.py) over a deterministic "
            f"{N_NODES}-node / 2x-out-edge skewed link graph (4096 hot "
            "hubs) at local[8] vs local[32]. Each round is one shuffle "
            "hash join + one map-side-combinable integer sum; lineage "
            "truncated every 3 rounds (checkpoint_interval default). "
            "normalized = graph 8->32 speedup / same-window pure-JVM "
            "CPU-kernel speedup; >=0.8 normalized means the engine adds "
            "no scaling bottleneck."
        ),
    }
    with open("/root/repo/BENCH_SCALING_GRAPH.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
