"""Data-bound webgraph bench (VERDICT r4 item 2): PageRank / HITS /
two-hop over the seeded power-law edge table at two sizes 10x apart,
so the ratio separates data cost from per-job constants (the contract
graph's 211 nodes measure scheduler overhead only).

Writes BENCH/WEBGRAPH.json with min/med/max spreads per (op, size).
Sizes are chosen per-op so the BIG point is genuinely data-bound on
this host: the iterative ops carry a ~0.3 s/stage scheduling floor at
local[32], so they need a larger base than the single-join two-hop.

Usage: python tools/bench_webgraph.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the 50M-edge localCheckpoint + HITS shuffles need more than the 8g
# session default in a single local-mode JVM (set before build_session)
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

from pyspark.sql import functions as F

from coap_rfc_knowledge_graph_spark.operators.webgraph import (
    hits_fixedpoint,
    pagerank_fixedpoint,
    synthetic_web_edges,
    two_hop_counts,
)
from coap_rfc_knowledge_graph_spark.session import build_session, warm_python_workers

# (op label, runner, small edges, big edges) — 10x apart per op
PLAN = [
    ("pagerank_iter5", lambda w: pagerank_fixedpoint(w, iterations=5).count(), 5_000_000, 50_000_000),
    ("hits_iter2", lambda w: hits_fixedpoint(w, iterations=2).count(), 5_000_000, 50_000_000),
    ("two_hop", lambda w: two_hop_counts(w).agg(F.sum("n_two_hop")).collect(), 1_000_000, 10_000_000),
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "WEBGRAPH.json"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeat = int(os.environ.get("SPARK_GRAFT_REPEAT", "3"))
    spark = build_session(app_name="kg-bench-webgraph", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark, cpus)

    results: dict[str, dict] = {}
    # one generation per distinct size, shared across ops
    cache: dict[int, object] = {}

    def edges(ne: int):
        if ne not in cache:
            cache[ne] = synthetic_web_edges(spark, ne).localCheckpoint(eager=True)
        return cache[ne]

    for op, fn, small, big in PLAN:
        for label, ne in (("small", small), ("big", big)):
            w = edges(ne)
            samples = []
            for _ in range(repeat):
                t0 = time.perf_counter()
                fn(w)
                samples.append(time.perf_counter() - t0)
            samples.sort()
            results[f"{op}_{label}"] = {
                "n_edges": ne,
                "n": len(samples),
                "min": round(samples[0], 3),
                "med": round(samples[len(samples) // 2], 3),
                "max": round(samples[-1], 3),
            }
        ratio = results[f"{op}_big"]["min"] / results[f"{op}_small"]["min"]
        results[f"{op}_ratio_at_10x_edges"] = round(ratio, 2)
        print(op, "small", results[f"{op}_small"]["min"], "big", results[f"{op}_big"]["min"], "ratio", round(ratio, 2), flush=True)

    results["cpus"] = cpus
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
