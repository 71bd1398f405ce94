"""Whole-registry physical-plan audit (r5) — automates the anti-pattern
sweep the round-4 review did by hand (grep for collect/crossJoin/udf).

For every `queries()` entry, build the DataFrame at sf0.01 and classify
its FORMATTED physical plan's nodes:

  - `BatchEvalPython` (row-at-a-time Python UDF) — NEVER allowed; the
    repo's contract is zero per-row Python anywhere.
  - `CartesianProduct` (non-broadcast cross join) — never allowed; the
    deliberate brute-force-kNN parity path uses a BROADCAST nested-loop
    join, which is bounded by the broadcast side.
  - Arrow-vectorized Python (`ArrowEvalPython`, `MapInPandas`,
    `FlatMapGroupsInPandas`, `FlatMapGroupsInPandasWithState`,
    `BroadcastNestedLoopJoin`) — allowed ONLY for entries whitelisted
    below, each with the design reason the plan can't avoid Python or a
    nested-loop (the reason is the audit's documentation, not a waiver).

Writes PLAN_AUDIT.json {entry: {nodes, exchanges, verdict}} plus a
summary line; exits non-zero if any entry is "unexpected" so this can
run as a gate. Streaming entries execute their micro-batches when the
registry callable materializes them — their audited plan is the batch
result's, and the stream-side shape is pytest-pinned instead.
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"

# entry -> (allowed node kinds, why Python/NLJ is the right plan there)
WHITELIST: dict[str, tuple[set[str], str]] = {
    # vectorized Arrow UDFs over the POLYGON table (thousands of rows,
    # never the page/doc side): geometry prep, area, centroid
    "isochrone_area": ({"ArrowEvalPython"}, "shoelace area over WKB polygons"),
    "unit_centroids": ({"ArrowEvalPython"}, "polygon centroid over WKB"),
    "pip_assignments": ({"ArrowEvalPython", "MapInPandas"},
                        "polygon edge prep (polygon-table-sized)"),
    "zcta_assignments": ({"ArrowEvalPython", "MapInPandas"},
                         "polygon edge prep (polygon-table-sized)"),
    "flagship_demographics": ({"ArrowEvalPython", "MapInPandas"},
                              "polygon edge prep + vectorized PIP refine"),
    "geometry_quarantine": ({"ArrowEvalPython", "MapInPandas"},
                            "WKB validity parse over the polygon table"),
    "zonal_stats": ({"ArrowEvalPython", "MapInPandas"},
                    "polygon cover prep upstream of the raster agg"),
    "polygon_burn": ({"ArrowEvalPython", "MapInPandas"},
                     "polygon cover prep (vector->raster)"),
    # simhash needs per-doc token hashing with bit accumulation — a
    # vectorized numpy kernel; no Catalyst expression computes it
    "simhash": ({"ArrowEvalPython"}, "64-bit simhash numpy kernel"),
    "simhash_pairs": ({"ArrowEvalPython"}, "64-bit simhash numpy kernel"),
    # multimodal: binary decode plumbing is mapInPandas BY DESIGN
    "binary_metadata": ({"MapInPandas"}, "binary column metadata extraction"),
    "frame_sample": ({"MapInPandas"}, "frame sampling over binary payloads"),
    # event sessions: custom stateful op (applyInPandasWithState twin's
    # batch form uses grouped pandas)
    "event_sessions": ({"FlatMapGroupsInPandas"},
                       "session gap-split is inherently per-key stateful"),
    "event_sessions_stream": ({"FlatMapGroupsInPandas",
                               "FlatMapGroupsInPandasWithState"},
                              "applyInPandasWithState stateful sessions"),
    # brute-force kNN parity path: BROADCAST nested-loop (bounded small
    # side), kept as the exactness oracle for the k-ring strategy; the
    # ArrowEvalPython is the vectorized EPSG:5070 Albers transform
    # (knn.py:50 — pandas_udf struct<x,y>), POI/page-batch-sized
    "knn_nearest": ({"BroadcastNestedLoopJoin", "ArrowEvalPython"},
                    "broadcast brute-force parity path + Albers UDF"),
    "knn_topk": ({"BroadcastNestedLoopJoin", "ArrowEvalPython"},
                 "broadcast brute-force top-k parity path + Albers UDF"),
    "knn_kring": ({"BroadcastNestedLoopJoin", "ArrowEvalPython"},
                  "Albers UDF + exactness-preserving brute-force fallback "
                  "(broadcast candidates; strategy='auto' caps the POI side)"),
    "centroid_nearest_poi": ({"BroadcastNestedLoopJoin", "ArrowEvalPython"},
                             "centroid UDF + broadcast nearest join"),
    "cluster_metrics": ({"BroadcastNestedLoopJoin"},
                        "one-row bounds frame broadcast-crossed"),
    "equal_interval_bins": ({"BroadcastNestedLoopJoin"},
                            "one-row min/max bounds frame broadcast-crossed "
                            "(stats.py:198)"),
    "poi_broadcast": ({"BroadcastNestedLoopJoin"},
                      "one-row first-POI frame broadcast onto every unit"),
    "unigram_familiarity": ({"BroadcastNestedLoopJoin"},
                            "one-row corpus-total frame broadcast-crossed "
                            "(operators/lm.py)"),
    "unigram_familiarity_salted": ({"BroadcastNestedLoopJoin"},
                                   "one-row corpus-total frame "
                                   "broadcast-crossed (operators/lm.py)"),
    "bigram_familiarity": ({"BroadcastNestedLoopJoin"},
                           "one-row corpus-total frame broadcast-crossed "
                           "(operators/lm.py)"),
    "corpus_curation_lm": ({"BroadcastNestedLoopJoin"},
                           "one-row corpus-total frame broadcast-crossed "
                           "on the LM branch (operators/lm.py)"),
    "raster_tiles": ({"FlatMapGroupsInPandas"},
                     "per-tile ndarray materialization (applyInPandas)"),
    # composites built on page_assignments / knn_join inherit the polygon
    # prep mapInPandas (polygon-table-sized) and the Albers/parity nodes
    "dedup_units": ({"ArrowEvalPython", "MapInPandas",
                     "BroadcastNestedLoopJoin"},
                    "PIP polygon prep + kNN Albers/parity upstream"),
    "counties_from_pages": ({"MapInPandas"},
                            "PIP polygon edge prep upstream"),
    "lineage_stats": ({"MapInPandas"},
                      "PIP polygon edge prep upstream of the audited stage"),
    # ANN family: vectorized hyperplane/IVF assignment pandas_udfs
    # (similarity.py:383,482,759 — embedding-batch Arrow kernels) and the
    # shared per-partition top-k HEAP kernel for the _many forms
    # (similarity.py:326 mapInPandas — O(1) plan size in |Q|)
    "lsh_ann": ({"ArrowEvalPython"}, "hyperplane bucket-hash Arrow kernel"),
    "ivf_ann": ({"ArrowEvalPython"}, "IVF cell-assignment Arrow kernel"),
    "embedding_dup": ({"ArrowEvalPython"},
                      "multi-table hyperplane LSH Arrow kernel"),
    "cosine_topk_many": ({"MapInPandas"}, "per-partition top-k heap kernel"),
    "lsh_ann_many": ({"ArrowEvalPython", "MapInPandas"},
                     "hyperplane hash + per-partition heap kernel"),
    "ivf_ann_many": ({"ArrowEvalPython", "MapInPandas"},
                     "IVF assignment + per-partition heap kernel"),
}

PY_NODES = {
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapGroupsInPandasWithState",
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
}


def main() -> None:
    import __spark_entry__ as entrymod
    from socialmapper_spark.session import get_spark

    spark = get_spark(master="local[8]")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    results: dict[str, dict] = {}
    unexpected = []
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001 — audit records, never dies
            results[name] = {"error": str(exc)[:200], "verdict": "error"}
            unexpected.append(name)
            continue
        ops = re.findall(r"^\(\d+\) (\w+)", plan, re.M)
        flagged = sorted({o for o in ops if o in PY_NODES})
        allowed, reason = WHITELIST.get(name, (set(), ""))
        bad = [o for o in flagged if o not in allowed]
        verdict = "clean" if not flagged else ("whitelisted" if not bad else "unexpected")
        if bad:
            unexpected.append(name)
        results[name] = {
            "python_or_nlj_nodes": flagged,
            "exchanges": sum(1 for o in ops if o == "Exchange"),
            "verdict": verdict,
            **({"reason": reason} if flagged and not bad else {}),
            **({"unexpected": bad} if bad else {}),
        }
    spark.stop()

    counts = {
        v: sum(1 for r in results.values() if r["verdict"] == v)
        for v in ("clean", "whitelisted", "unexpected", "error")
    }
    out = {"sf": SF_DIR, "counts": counts, "entries": results}
    with open("/root/repo/PLAN_AUDIT.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"metric": "plan_audit", **counts}))
    if unexpected:
        print("UNEXPECTED:", unexpected, file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
