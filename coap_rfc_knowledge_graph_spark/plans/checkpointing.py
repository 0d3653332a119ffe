"""Per-stage checkpoint / lineage manifests + resume-from-failure.

North rule: "resumable from checkpoint with per-partition lineage +
metrics". Every pipeline stage writes its output table plus a manifest:

    <root>/<stage>/data/...parquet      the stage output
    <root>/<stage>/manifest.json        stage-level lineage + metrics
                                        incl. per-partition rows + an
                                        order-insensitive content hash

A stage is COMPLETE iff its manifest exists and carries ``complete``;
the manifest is written AFTER the parquet commit (write-then-publish),
so a crash mid-stage leaves no manifest and the stage re-runs cleanly
from its (complete) inputs. Resume = skip every complete stage and
rebuild the rest from the stored inputs — exactly the pickle-per-stage
hand-off of the reference (``src/entity_extractor.py:61-62`` et al.)
upgraded to audited, partition-aware table snapshots.

In production these directories are Iceberg tables and the manifest
content lives in snapshot summary metadata; the layout here is plain
parquet + JSON so the mechanism is testable in-sandbox. The content
hash is ``sum(xxhash64(row))`` — order- and partitioning-insensitive,
so equality across runs at different parallelism certifies identical
output tables (used by the kill/resume test).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageStore:
    """Filesystem-backed store of stage outputs + manifests."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def manifest_path(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "manifest.json")

    def has(self, stage: str, params: dict | None = None) -> bool:
        """True iff the stage committed completely — and, when ``params``
        is given, was produced under the SAME parameters. A stage whose
        output depends on run configuration (curation flags, blocklist
        content) must pass its params here AND to :meth:`write`;
        otherwise resuming with different flags would silently reuse the
        stale snapshot (e.g. --pii-redact added after a --clean run
        would never mask anything)."""
        p = self.manifest_path(stage)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as fh:
                m = json.load(fh)
        except (OSError, json.JSONDecodeError):
            return False
        if not m.get("complete"):
            return False
        return params is None or m.get("params") == params

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self._dir(stage), "data"))

    def manifest(self, stage: str) -> dict:
        with open(self.manifest_path(stage)) as fh:
            return json.load(fh)

    def write(
        self,
        df: DataFrame,
        stage: str,
        inputs: list[str] | None = None,
        partition_by: str | None = None,
        params: dict | None = None,
    ) -> DataFrame:
        """Materialize ``df`` as the stage output; publish the manifest
        last. Returns the re-read DataFrame (so downstream stages consume
        the committed snapshot, not the live lineage)."""
        data_dir = os.path.join(self._dir(stage), "data")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        t0 = time.time()
        writer.parquet(data_dir)
        compute_sec = time.time() - t0  # plan execution + parquet commit

        spark = df.sparkSession
        committed = spark.read.parquet(data_dir)
        cols = [c for c in committed.columns]
        hashed = committed.withColumn("__pid", F.spark_partition_id()).withColumn(
            "__h", F.xxhash64(*[F.col(c).cast("string") for c in cols])
        )
        stats = (
            hashed.groupBy("__pid")
            .agg(
                F.count("*").alias("rows"),
                # decimal sum: multiset digest (xor would cancel duplicate
                # rows), overflow-safe to ~10^19 rows per partition
                F.sum(F.col("__h").cast("decimal(38,0)")).alias("content_hash"),
            )
            .collect()
        )
        partitions = [
            {"partition_id": int(r["__pid"]), "rows": int(r["rows"]), "content_hash": int(r["content_hash"])}
            for r in sorted(stats, key=lambda r: r["__pid"])
        ]
        manifest = {
            "stage": stage,
            "inputs": inputs or [],
            "params": params,
            "schema": committed.schema.simpleString(),
            "row_count": sum(p["rows"] for p in partitions),
            # order- AND partitioning-insensitive multiset digest
            "table_hash": int(sum(p["content_hash"] for p in partitions)),
            "partitions": partitions,
            # metrics: wall time of the stage's plan execution + parquet
            # commit (the audit pass below is bookkeeping, not stage cost)
            "compute_sec": round(compute_sec, 3),
            "written_at": time.time(),
            "complete": True,
        }
        tmp = self.manifest_path(stage) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=2)
        os.replace(tmp, self.manifest_path(stage))
        return committed


# --- resumable pipeline -------------------------------------------------------

STAGES = ["sentences", "mentions", "triples", "entities", "rules", "edges", "contradictions"]


def run_resumable(
    spark: SparkSession,
    pages: DataFrame,
    root: str,
    url_partitions: int | None = None,
    fail_after: str | None = None,
) -> StageStore:
    """Run the KG pipeline writing each stage through the StageStore;
    stages whose manifests are complete are SKIPPED (their committed
    parquet feeds downstream). ``fail_after`` injects a crash after the
    named stage commits — the kill/resume test hook."""
    from ..operators.contradictions import check_entity_contradiction
    from ..operators.linking import canonical_entities, link_surfaces
    from ..operators.mentions import extract_mentions
    from ..operators.relations import extract_triples_from_arrays
    from ..operators.rule_filter import rule_sentences
    from ..operators.rules import build_edges
    from ..operators.sentences import extract_sentences

    store = StageStore(root)

    def stage(name: str, build, inputs: list[str]):
        if store.has(name):
            return store.read(spark, name)
        out = store.write(build(), name, inputs=inputs)
        if fail_after == name:
            raise RuntimeError(f"injected failure after stage {name!r}")
        return out

    sentences = stage("sentences", lambda: extract_sentences(pages, url_partitions=url_partitions), ["pages"])
    mentions_arr = stage("mentions", lambda: extract_mentions(sentences, explode=False), ["sentences"])
    triples = stage("triples", lambda: extract_triples_from_arrays(mentions_arr), ["mentions"])
    from ..operators.mentions import _explode_mentions

    mentions = _explode_mentions(mentions_arr)  # explode_outer: no UDF re-eval
    entities = stage("entities", lambda: canonical_entities(mentions), ["mentions"])

    def build_rules_df():
        from .pipeline import KGResult, rules_stage

        res = KGResult(
            sentences=sentences,
            rule_sentences=rule_sentences(sentences),
            mentions=mentions,
            triples=triples,
            entities=entities,
        )
        return rules_stage(res).rules

    rules = stage("rules", build_rules_df, ["sentences", "mentions", "entities"])
    stage("edges", lambda: build_edges(rules), ["rules"])
    stage("contradictions", lambda: check_entity_contradiction(rules), ["rules"])
    return store
