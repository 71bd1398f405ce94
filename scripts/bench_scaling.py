"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule demands ≥0.8 throughput scaling efficiency between N and 4N
executors; the sandbox proxy (driver instruction) is the same job on the
same input at local[8] vs local[32]:

    efficiency = throughput(32) / (4 × throughput(8))

Runs bench.py in a subprocess per parallelism (fresh JVM each — no
warm-cache bleed between configurations), repeats each config
``--runs`` times, takes the best run per config (steady-state proxy),
writes BENCH_SCALING.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNS = int(os.environ.get("SCALING_RUNS", "2"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_bench(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=SF_DIR)
    out = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def main() -> None:
    results = {}
    for cpus in (8, 32):
        best = None
        for _ in range(RUNS):
            r = run_bench(cpus)
            if best is None or r["value"] > best["value"]:
                best = r
        results[cpus] = best
        print(f"local[{cpus}]: {best['value']} pages/sec "
              f"(flagship {best['queries']['flagship']}s)", file=sys.stderr)

    t8, t32 = results[8]["value"], results[32]["value"]
    eff = t32 / (4.0 * t8)
    summary = {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "throughput_local8_pages_per_sec": t8,
        "throughput_local32_pages_per_sec": t32,
        "flagship_sec_local8": results[8]["queries"]["flagship"],
        "flagship_sec_local32": results[32]["queries"]["flagship"],
        "sf": SF_DIR,
        "detail": {str(k): v for k, v in results.items()},
    }
    with open("/root/repo/BENCH_SCALING.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
