"""Two-scale-factor bench rows for the round-5 operators (the
BASELINE.md convention: a single scale point cannot separate fixed job
cost from data cost, so every new operator family gets sf0.01 AND
sf0.1 timings). Times the round-5 contract queries through
``__spark_entry__.queries()``; min over repeats, spreads printed.

Usage: python tools/bench_r5_ops.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from coap_rfc_knowledge_graph_spark.session import build_session, warm_python_workers

R5_QUERIES = [
    "host_graph",
    "domain_graph",
    "robots_filter",
    "script_profile",
    "graph_pagerank_weighted",
    "graph_harmonic",
    "graph_components",
    "crawl_delta",
    "media_decode_features",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "R5_OPS.json"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeat = int(os.environ.get("SPARK_GRAFT_REPEAT", "2"))
    spark = build_session(app_name="kg-bench-r5", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark, cpus)
    qs = entrymod.queries()
    results: dict[str, dict] = {}
    for name in R5_QUERIES:
        for sf, sf_dir in (("sf0.01", "/root/testdata/sf0.01"), ("sf0.1", "/root/testdata/sf0.1")):
            samples = []
            for _ in range(repeat):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).count()
                samples.append(round(time.perf_counter() - t0, 3))
            samples.sort()
            results[f"{name}_{sf}"] = {"min": samples[0], "max": samples[-1], "n": len(samples)}
        r = results[f"{name}_sf0.1"]["min"] / max(results[f"{name}_sf0.01"]["min"], 1e-9)
        results[f"{name}_ratio_at_10x"] = round(r, 2)
        print(
            name,
            "sf0.01", results[f"{name}_sf0.01"]["min"],
            "sf0.1", results[f"{name}_sf0.1"]["min"],
            "ratio", results[f"{name}_ratio_at_10x"],
            flush=True,
        )
    results["cpus"] = cpus
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
