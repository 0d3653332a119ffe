"""Two-parallelism scaling evidence for the GRAPH family (round 5):
run fixed-point PageRank over the SAME seeded 50M-edge power-law graph
at pinned local[4] and local[16] and report throughput at both plus
scaling efficiency = (t_low / t_high) / (hi / lo). The flagship
pipeline already has this evidence (BENCH/SCALING*.json); the graph
job has a different shuffle character (iterative join+agg on node
keys, no Python workers at all), so it is a second, independent
check of the north rule's >=0.8 N -> 4N criterion.

Protocol matches tools/bench_scaling.py: each level's WHOLE process
tree is taskset-pinned to exactly its nominal core count (unpinned, a
local[4] JVM borrows idle cores for GC/shuffle threads and
over-measures the low level). The edge table is generated inside each
worker from the same seed — identical input by construction — and
eagerly localCheckpointed so generation cost is excluded from the
timed region. Writes BENCH/SCALING_WEBGRAPH.json.

Usage:  python tools/bench_webgraph_scaling.py            # orchestrate
        python tools/bench_webgraph_scaling.py --worker N # one level
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_EDGES = int(os.environ.get("SPARK_GRAFT_SCALE_GRAPH_EDGES", "50000000"))
ITERATIONS = 5
REPEAT = int(os.environ.get("SPARK_GRAFT_SCALE_GRAPH_REPEAT", "2"))


def worker(cpus: int) -> None:
    sys.path.insert(0, REPO)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    from coap_rfc_knowledge_graph_spark.operators.webgraph import (
        pagerank_fixedpoint,
        synthetic_web_edges,
    )
    from coap_rfc_knowledge_graph_spark.session import build_session

    spark = build_session(app_name=f"kg-graph-scaling-{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    edges = synthetic_web_edges(spark, N_EDGES).localCheckpoint(eager=True)
    samples = []
    for _ in range(REPEAT):
        t0 = time.perf_counter()
        pagerank_fixedpoint(edges, iterations=ITERATIONS).count()
        samples.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"cpus": cpus, "n_edges": N_EDGES, "samples": sorted(samples)}))


def run_level(cpus: int) -> dict:
    pinned = bool(shutil.which("taskset") and cpus <= (os.cpu_count() or 0))
    cmd = [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)]
    if pinned:
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600, check=True)
    r = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])
    r["pinned"] = pinned
    return r


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return
    lo = int(os.environ.get("SPARK_GRAFT_SCALE_LO", "4"))
    hi = int(os.environ.get("SPARK_GRAFT_SCALE_HI", "16"))
    r_lo, r_hi = run_level(lo), run_level(hi)
    t_lo, t_hi = r_lo["samples"][0], r_hi["samples"][0]
    eff = (t_lo / t_hi) / (hi / lo) if t_hi else 0.0
    result = {
        "job": f"pagerank_fixedpoint iterations={ITERATIONS}",
        "n_edges": N_EDGES,
        "parallelism_low": lo,
        "parallelism_high": hi,
        "sec_low": t_lo,
        "sec_high": t_hi,
        "samples_low": r_lo["samples"],
        "samples_high": r_hi["samples"],
        "edges_per_sec_low": round(N_EDGES / t_lo),
        "edges_per_sec_high": round(N_EDGES / t_hi),
        "scaling_efficiency": round(eff, 3),
        "core_pinned": r_lo["pinned"] and r_hi["pinned"],
        "target": 0.8,
        "meets_target": eff >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH", "SCALING_WEBGRAPH.json"), "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
