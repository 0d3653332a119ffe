"""Kill/resume at replicated scale (VERDICT r4 item 4): run the
resumable KG pipeline over the 64x-replicated sf0.1 corpus (320k docs),
crash after the extract ('triples') stage commits, resume, and assert
every downstream manifest table_hash equals an uninterrupted run's —
the north rule's resume-from-failure clause exercised at a corpus size
where stage recomputation would actually hurt.

Writes BENCH/KILL_RESUME.json. Usage: python tools/kill_resume_scale.py
[mult] (default 64).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from coap_rfc_knowledge_graph_spark.plans.checkpointing import StageStore, run_resumable
from coap_rfc_knowledge_graph_spark.session import build_session, warm_python_workers
from coap_rfc_knowledge_graph_spark.sources.pages import pages_from_documents

STAGES = ["sentences", "mentions", "triples", "entities", "rules", "edges", "contradictions"]


def replicated_pages(spark, sf_dir: str, mult: int, cpus: int):
    pages = pages_from_documents(spark, sf_dir)
    if mult > 1:
        # distribute base rows BEFORE the fan-out (same discipline as
        # bench.py: otherwise one task writes the whole replica set)
        pages = (
            pages.repartition(4 * cpus)
            .select("*", F.explode(F.array(*[F.lit(i) for i in range(mult)])).alias("__rep"))
            .withColumn("url", F.concat_ws("/", "url", F.col("__rep")))
            .drop("__rep")
        )
    return pages


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(app_name="kg-kill-resume", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark, cpus)
    pages = replicated_pages(spark, sf_dir, mult, cpus)
    n_docs = pages.count()

    work = tempfile.mkdtemp(prefix="kgkr_")
    root_kill = os.path.join(work, "killed")
    root_full = os.path.join(work, "full")
    report: dict = {"mult": mult, "n_docs": n_docs, "sf_dir": sf_dir}

    t0 = time.perf_counter()
    try:
        run_resumable(spark, pages, root_kill, fail_after="triples")
        raise SystemExit("injected failure did not fire")
    except RuntimeError as e:
        assert "injected failure" in str(e), e
    report["killed_run_sec"] = round(time.perf_counter() - t0, 1)

    store_k = StageStore(root_kill)
    mtimes = {s: os.path.getmtime(store_k.manifest_path(s)) for s in ["sentences", "mentions", "triples"]}

    t0 = time.perf_counter()
    run_resumable(spark, pages, root_kill)  # resume
    report["resume_run_sec"] = round(time.perf_counter() - t0, 1)
    for s, t in mtimes.items():
        assert os.path.getmtime(store_k.manifest_path(s)) == t, f"stage {s} recomputed on resume"

    t0 = time.perf_counter()
    run_resumable(spark, pages, root_full)  # uninterrupted reference
    report["uninterrupted_run_sec"] = round(time.perf_counter() - t0, 1)

    store_f = StageStore(root_full)
    hashes = {}
    for s in STAGES:
        hk, hf = store_k.manifest(s)["table_hash"], store_f.manifest(s)["table_hash"]
        assert hk == hf, f"stage {s}: resumed hash {hk} != uninterrupted {hf}"
        hashes[s] = hk
    report["table_hashes_equal"] = True
    report["table_hashes"] = {k: str(v) for k, v in hashes.items()}
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "KILL_RESUME.json"
    )
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(json.dumps(report, indent=1, sort_keys=True))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
