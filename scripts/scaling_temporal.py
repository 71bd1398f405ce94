"""One timed temporal-join run for the scaling harness (ninth workload
beside flagship / curation / corpus / dedup / knn / raster / pip /
streaming — evidences the r5 temporal-join family:
operators/temporal.py asof_join + interval_join).

Usage: python scripts/scaling_temporal.py <cores> <replicate>

Workload (the production shape — the EVENT side grows, the per-key
snapshot/interval cadence stays fixed):

- events = sf0.1 events replicated <replicate>x IN-PLAN (one explode
  branch) with per-copy user_id AND event_id variation, so the key
  cardinality scales with the data (1500 users -> 1500*replicate) and
  no aggregation can collapse copies.
- asof_join: purchase snapshots derived from the replicated frame
  (~13 snapshots/key at any replicate — per-key state bounded by
  cadence, the operator's scale claim) as-of joined back onto ALL
  events; checksum sink over the picked (snap_ts, snap_value).
- interval_join: every 100th BASE event (the unreplicated frame — a
  fixed campaign calendar; deriving intervals from the replicated frame
  would grow output pairs quadratically with replicate, since replicas
  share timestamps) opens a 45-minute window keyed by event_type; all
  replicated events attributed by containment; checksum sink.

At replicate>=32 the snapshot dimension (48k+ keys, ~30 MB+) exceeds
the broadcast threshold, so the measured plan is the honest big-dim
shape: one shuffle per side into a shuffled hash/sort-merge join — the
same plan a 100 TB run would execute. Fresh JVM per invocation; prints
one JSON line {"cores": N, "sec": t, "asof_sec": a, "interval_sec": i,
"events": n}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", str(1 * 1024 * 1024))

from pyspark.sql import functions as F  # noqa: E402

from socialmapper_spark.operators.temporal import (  # noqa: E402
    asof_join,
    interval_join,
)
from socialmapper_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(
        app_name=f"scaling-temporal-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(2 * cores, 16),
    )
    # events.parquet ships as ONE row group — Spark's minimum split unit —
    # so without this repartition the in-plan 64x explode (the bulk of the
    # work) runs on ONE task at ANY core count and the harness measures
    # scan granularity, not the operator (the r4 fixture lesson; the first
    # recorded run showed raw 0.255 with the kernel at 0.271 — both arms
    # were single-task-bound). The 100k-row / 2 MB repartition shuffle is
    # inside the timed window but three orders of magnitude below the work
    # it parallelizes.
    base = spark.read.parquet("/root/testdata/sf0.1/events.parquet").repartition(
        cores * 4
    )
    events = base
    if replicate > 1:
        events = (
            events.withColumn(
                "__r", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1)))
            )
            # vary BOTH keys per copy: user_id so join-key cardinality
            # scales, event_id so the interval side scales with it
            .withColumn(
                "user_id",
                F.col("user_id") + F.col("__r").cast("long") * F.lit(10_000_000),
            )
            .withColumn(
                "event_id",
                F.col("event_id") + F.col("__r").cast("long") * F.lit(1_000_000_000),
            )
            .drop("__r")
        )
    n = events.count()  # warm scan + JVM

    t0 = time.perf_counter()
    snaps = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("snap_ts"))
        .agg(F.max("value").alias("snap_value"))
    )
    out = asof_join(
        events.select("event_id", "user_id", "ts"),
        snaps,
        on="user_id",
        left_ts="ts",
        right_ts="snap_ts",
    )
    out.select(
        F.bit_xor(
            F.xxhash64("event_id", "user_id", "snap_ts", "snap_value")
        ).alias("chk"),
        F.count("*").alias("rows"),
    ).collect()
    asof_sec = round(time.perf_counter() - t0, 3)
    spark.catalog.clearCache()

    t0 = time.perf_counter()
    ivals = base.filter(F.col("event_id") % 100 == 0).select(
        F.col("event_id").alias("interval_id"),
        "event_type",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 45 MINUTES")).alias("end_ts"),
    )
    iout = interval_join(
        events.select("event_id", "event_type", "ts"),
        ivals,
        point_ts="ts",
        on=["event_type"],
        bucket_seconds=3600,
    )
    iout.select(
        F.bit_xor(F.xxhash64("event_id", "interval_id", "ts")).alias("chk"),
        F.count("*").alias("rows"),
    ).collect()
    interval_sec = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "cores": cores,
                "sec": round(asof_sec + interval_sec, 3),
                "asof_sec": asof_sec,
                "interval_sec": interval_sec,
                "events": n,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
