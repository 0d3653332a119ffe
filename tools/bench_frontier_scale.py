"""Data-bound two-point bench for the round-5 tail families (sitemap
parse, crawl frontier) — same pattern as tools/bench_r5_scale.py:
each op over synthesized inputs at two sizes 10x apart, inputs eagerly
localCheckpointed so generation is excluded from the timed region.

Usage: python tools/bench_frontier_scale.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

from pyspark.sql import functions as F

from coap_rfc_knowledge_graph_spark.operators.frontier import crawl_frontier
from coap_rfc_knowledge_graph_spark.operators.sitemap import parse_sitemaps
from coap_rfc_knowledge_graph_spark.session import build_session, warm_python_workers


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "FRONTIER_SCALE.json",
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeat = int(os.environ.get("SPARK_GRAFT_REPEAT", "2"))
    spark = build_session(app_name="kg-bench-frontier-scale", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark, cpus)

    def sitemaps(n: int):
        # one urlset per host, five fully-populated url entries each
        i = F.col("id")
        host = F.concat(F.lit("h"), i.cast("string"), F.lit(".example"))
        entry = lambda j: F.concat(  # noqa: E731
            F.lit("  <url><loc>https://"), host, F.lit(f"/p{j}-"), i.cast("string"),
            F.lit("</loc><lastmod>2026-08-0"), ((i + j) % 9 + 1).cast("string"),
            F.lit("</lastmod><changefreq>daily</changefreq><priority>0."),
            ((i + j) % 10).cast("string"), F.lit("</priority></url>\n"),
        )
        payload = F.concat(
            F.lit('<?xml version="1.0"?>\n<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'),
            entry(0), entry(1), entry(2), entry(3), entry(4),
            F.lit("</urlset>"),
        )
        return spark.range(n).select(
            host.alias("host"), payload.alias("payload")
        ).localCheckpoint(eager=True)

    def edge_world(n: int):
        # dst urls collide n/200k-fold on 10k hosts; every 4th leaf crawled
        i = F.col("id")
        host = F.concat(
            F.lit("h"), F.pmod(i * 2654435761, F.lit(10_000)).cast("string"),
            F.lit(".example"),
        )
        dst = F.concat(
            F.lit("https://"), host,
            F.when(F.pmod(i, F.lit(2)) == 0, "/a/f").otherwise("/f"),
            F.pmod(i, F.lit(200_000)).cast("string"),
        )
        edges = spark.range(n).select(
            F.concat(F.lit("https://s"), F.pmod(i, F.lit(64)).cast("string"),
                     F.lit(".example/p")).alias("src"),
            dst.alias("dst"),
        ).localCheckpoint(eager=True)
        crawled = spark.range(n).filter(F.pmod(i, F.lit(200_000)) % 4 == 0).select(
            dst.alias("url")
        ).localCheckpoint(eager=True)
        ranks = spark.range(10_000).select(
            F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".example")).alias("host"),
            F.pmod(F.col("id") * 37, F.lit(1000)).alias("rank"),
        ).localCheckpoint(eager=True)
        return edges, crawled, ranks

    PLAN = [
        (
            "sitemap_parse",
            lambda: sitemaps(50_000),
            lambda: sitemaps(500_000),
            lambda d: parse_sitemaps(d).agg(F.sum("priority_millis")).collect(),
        ),
        (
            "crawl_frontier",
            lambda: edge_world(1_000_000),
            lambda: edge_world(10_000_000),
            lambda w: crawl_frontier(w[0], w[1], w[2], k=10).count(),
        ),
    ]
    if os.environ.get("SPARK_GRAFT_FRONTIER_BIG"):
        # the 10M point is still fixed-cost dominated on 32 cores; this
        # optional pair exposes the data term (SPARK_GRAFT_FRONTIER_BIG=1)
        PLAN.append(
            (
                "crawl_frontier_100m",
                lambda: edge_world(10_000_000),
                lambda: edge_world(100_000_000),
                lambda w: crawl_frontier(w[0], w[1], w[2], k=10).count(),
            )
        )

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
