"""Data-bound two-point bench for the round-5 operator families (the
BENCH/WEBGRAPH.json pattern): each op runs over synthesized inputs at
two sizes 10x apart, so the ratio separates data cost from the
local-mode per-job constant that dominates the contract-scale rows in
BENCH/R5_OPS.json.

Usage: python tools/bench_r5_scale.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

from pyspark.sql import functions as F

from coap_rfc_knowledge_graph_spark.operators.robots import robots_filter
from coap_rfc_knowledge_graph_spark.operators.text_stats import script_profile
from coap_rfc_knowledge_graph_spark.operators.webgraph import (
    harmonic_centrality_sketch,
    host_graph,
    pagerank_weighted,
    synthetic_web_edges,
)
from coap_rfc_knowledge_graph_spark.operators.webtext import crawl_delta
from coap_rfc_knowledge_graph_spark.session import build_session, warm_python_workers


def _urls(spark, n: int, hosts: int = 10_000):
    i = F.col("id")
    return spark.range(n).select(
        F.concat(
            F.lit("https://h"),
            F.pmod(i * 2654435761, F.lit(hosts)).cast("string"),
            F.lit(".example/p"),
            F.pmod(i, F.lit(37)).cast("string"),
            F.lit("/f"),
            i.cast("string"),
        ).alias("url"),
        i.alias("k"),
    )


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "R5_SCALE.json"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeat = int(os.environ.get("SPARK_GRAFT_REPEAT", "2"))
    spark = build_session(app_name="kg-bench-r5-scale", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark, cpus)

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )

    def docs_x(mult: int):
        out = docs
        for j in range(1, mult):
            out = out.unionByName(
                docs.select((F.col("doc_id") + j * 1_000_000).alias("doc_id"), "text")
            )
        return out.localCheckpoint(eager=True)

    def url_edges(n: int):
        i = F.col("id")
        return spark.range(n).select(
            F.concat(
                F.lit("https://h"),
                F.pmod(i * 2654435761, F.lit(10_000)).cast("string"),
                F.lit(".example/p/"),
                i.cast("string"),
            ).alias("src"),
            F.concat(
                F.lit("https://h"),
                F.pmod(i * 22695477 + 1, F.lit(10_000)).cast("string"),
                F.lit(".example/q/"),
                F.pmod(i, F.lit(1000)).cast("string"),
            ).alias("dst"),
        ).localCheckpoint(eager=True)

    def snapshot(n: int, changed_every: int):
        i = F.col("id")
        return spark.range(n).select(
            F.concat(F.lit("https://s.example/"), i.cast("string")).alias("url"),
            F.md5(
                F.when(F.pmod(i, F.lit(changed_every)) == 0, F.concat(i.cast("string"), F.lit("v2")))
                .otherwise(i.cast("string"))
            ).alias("fingerprint"),
        ).localCheckpoint(eager=True)

    rules = (
        spark.range(10_000)
        .select(
            F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".example")).alias("host"),
            (F.pmod(F.col("id"), F.lit(2)) == 0).alias("allow"),
            F.concat(F.lit("/p"), F.pmod(F.col("id"), F.lit(37)).cast("string")).alias(
                "path_prefix"
            ),
        )
        .localCheckpoint(eager=True)
    )

    # (label, small-input builder, big-input builder, runner)
    PLAN = [
        (
            "script_profile",
            lambda: docs_x(8),
            lambda: docs_x(80),
            lambda d: script_profile(d).agg(F.sum("n_latin")).collect(),
        ),
        (
            "crawl_delta",
            lambda: (snapshot(1_000_000, 7), snapshot(1_000_000, 5)),
            lambda: (snapshot(10_000_000, 7), snapshot(10_000_000, 5)),
            lambda p: crawl_delta(p[0], p[1]).groupBy("status").count().collect(),
        ),
        (
            "robots_filter",
            lambda: _urls(spark, 500_000).localCheckpoint(eager=True),
            lambda: _urls(spark, 5_000_000).localCheckpoint(eager=True),
            lambda u: robots_filter(u, rules).filter("robots_allowed").count(),
        ),
        (
            "host_graph",
            lambda: url_edges(1_000_000),
            lambda: url_edges(10_000_000),
            lambda e: host_graph(e).count(),
        ),
        (
            "pagerank_weighted",
            lambda: synthetic_web_edges(spark, 5_000_000)
            .withColumn("weight", 1 + F.pmod(F.col("src") + F.col("dst"), F.lit(5)))
            .localCheckpoint(eager=True),
            lambda: synthetic_web_edges(spark, 50_000_000)
            .withColumn("weight", 1 + F.pmod(F.col("src") + F.col("dst"), F.lit(5)))
            .localCheckpoint(eager=True),
            lambda e: pagerank_weighted(e, iterations=3).count(),
        ),
        (
            "harmonic_sketch_r2",
            lambda: synthetic_web_edges(spark, 1_000_000).localCheckpoint(eager=True),
            lambda: synthetic_web_edges(spark, 10_000_000).localCheckpoint(eager=True),
            lambda e: harmonic_centrality_sketch(e, radius=2).agg(F.sum("n_reached")).collect(),
        ),
    ]

    results: dict[str, dict] = {}
    for name, small, big, run in PLAN:
        for label, build in (("small", small), ("big", big)):
            inp = build()
            samples = []
            for _ in range(repeat):
                t0 = time.perf_counter()
                run(inp)
                samples.append(round(time.perf_counter() - t0, 3))
            samples.sort()
            results[f"{name}_{label}"] = {"min": samples[0], "max": samples[-1], "n": len(samples)}
        ratio = results[f"{name}_big"]["min"] / max(results[f"{name}_small"]["min"], 1e-9)
        results[f"{name}_ratio_at_10x"] = round(ratio, 2)
        print(
            name,
            "small", results[f"{name}_small"]["min"],
            "big", results[f"{name}_big"]["min"],
            "ratio", results[f"{name}_ratio_at_10x"],
            flush=True,
        )
    results["cpus"] = cpus
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
