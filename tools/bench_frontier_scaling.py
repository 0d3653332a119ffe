"""Two-parallelism scaling evidence for the FRONTIER family (round-5
tail): run crawl_frontier over the SAME seeded 100M-edge world at
pinned local[4] and local[16] and report throughput at both plus
scaling efficiency = (t_low / t_high) / (hi / lo). This is a third
independent job shape for the north rule's >=0.8 N -> 4N criterion:
the flagship covers the Python-UDF pipeline, SCALING_WEBGRAPH the
iterative join+agg loop, and this one the single-pass hash-agg +
anti-join + two-level-window shape.

Protocol matches tools/bench_scaling.py: each level's WHOLE process
tree is taskset-pinned to exactly its nominal core count; inputs are
generated inside each worker from the same expressions — identical by
construction — and eagerly localCheckpointed so generation cost is
excluded from the timed region. Writes BENCH/SCALING_FRONTIER.json.

Usage:  python tools/bench_frontier_scaling.py            # orchestrate
        python tools/bench_frontier_scaling.py --worker N # one level
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_EDGES = int(os.environ.get("SPARK_GRAFT_SCALE_FRONTIER_EDGES", "100000000"))
REPEAT = int(os.environ.get("SPARK_GRAFT_SCALE_FRONTIER_REPEAT", "2"))


def worker(cpus: int) -> None:
    sys.path.insert(0, REPO)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    from pyspark.sql import functions as F

    from coap_rfc_knowledge_graph_spark.operators.frontier import crawl_frontier
    from coap_rfc_knowledge_graph_spark.session import build_session

    spark = build_session(app_name=f"kg-frontier-scaling-{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    i = F.col("id")
    host = F.concat(
        F.lit("h"), F.pmod(i * 2654435761, F.lit(10_000)).cast("string"), F.lit(".example")
    )
    dst = F.concat(
        F.lit("https://"), host,
        F.when(F.pmod(i, F.lit(2)) == 0, "/a/f").otherwise("/f"),
        F.pmod(i, F.lit(200_000)).cast("string"),
    )
    edges = spark.range(N_EDGES).select(
        F.concat(F.lit("https://s"), F.pmod(i, F.lit(64)).cast("string"),
                 F.lit(".example/p")).alias("src"),
        dst.alias("dst"),
    ).localCheckpoint(eager=True)
    crawled = spark.range(N_EDGES).filter(F.pmod(i, F.lit(200_000)) % 4 == 0).select(
        dst.alias("url")
    ).localCheckpoint(eager=True)
    ranks = spark.range(10_000).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".example")).alias("host"),
        F.pmod(F.col("id") * 37, F.lit(1000)).alias("rank"),
    ).localCheckpoint(eager=True)
    samples = []
    for _ in range(REPEAT):
        t0 = time.perf_counter()
        crawl_frontier(edges, crawled, ranks, k=10).count()
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
        "job": "crawl_frontier k=10 (hash-agg + anti-join + rank-join + 2-level window)",
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
    with open(os.path.join(REPO, "BENCH", "SCALING_FRONTIER.json"), "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
