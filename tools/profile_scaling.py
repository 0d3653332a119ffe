"""Phase-level scaling profile of the flagship (diagnostic, not a bench).

Runs the flagship's phases as separate actions at the configured core
count and prints per-phase wall time, so tools/bench_scaling.py's
end-to-end efficiency number can be attributed to a phase. Pin cores
the same way the harness does:

    taskset -c 0-3  python tools/profile_scaling.py 4
    taskset -c 0-15 python tools/profile_scaling.py 16
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mult = int(os.environ.get("SPARK_GRAFT_DOCS_MULT", "16"))

    from pyspark.sql import functions as F

    from coap_rfc_knowledge_graph_spark.operators.mentions import extract_mentions
    from coap_rfc_knowledge_graph_spark.operators.relations import (
        extract_triples_from_arrays,
    )
    from coap_rfc_knowledge_graph_spark.operators.sentences import extract_sentences
    from coap_rfc_knowledge_graph_spark.session import build_session, warm_python_workers
    from coap_rfc_knowledge_graph_spark.sources.pages import pages_from_documents

    spark = build_session(app_name="kg-profile", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark, cpus)

    pages = pages_from_documents(spark, sf_dir)
    pages = pages.repartition(4 * cpus)
    pages = pages.select(
        "*", F.explode(F.array(*[F.lit(i) for i in range(mult)])).alias("__rep")
    ).withColumn("url", F.concat_ws("/", "url", F.col("__rep"))).drop("__rep")

    url_partitions = int(os.environ.get("SPARK_GRAFT_URL_PARTITIONS", "128"))
    out: dict[str, float] = {"cpus": cpus}

    def timed(name, fn):
        t0 = time.perf_counter()
        r = fn()
        out[name] = round(time.perf_counter() - t0, 3)
        return r

    # warm-up pass (mirror the harness: cold excluded from steady state)
    sents_w = extract_sentences(pages, url_partitions=url_partitions)
    sents_w.count()

    sents = extract_sentences(pages, url_partitions=url_partitions).persist()
    timed("sentences", sents.count)
    marr = extract_mentions(sents, explode=False).persist()
    timed("mentions", marr.count)
    timed("triples", lambda: extract_triples_from_arrays(marr).count())
    sents.unpersist()
    marr.unpersist()

    # and the un-decomposed flagship for reference
    spark.catalog.clearCache()
    from coap_rfc_knowledge_graph_spark.plans.pipeline import extract_stage

    timed("e2e", lambda: extract_stage(pages, url_partitions=url_partitions).triples.count())
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
