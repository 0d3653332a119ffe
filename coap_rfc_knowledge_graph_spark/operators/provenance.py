"""Triple provenance: collapse per-page extractions into one graph
fact with evidence.

The extraction stage emits one triple row per (page, sentence) it was
found in; the materialized graph wants one row per DISTINCT
(subj, pred, obj) carrying how often and where it was seen — the
support count drives confidence thresholds, and the source sample
drives auditability (the reference keeps `rule_sentence_num` pointers
back into the corpus for the same reason —
CoAP_contradiction_checking.py:210-216).

Scale shape: a two-level salted aggregation, the same pattern as
``dedup.exact_duplicates``: a mega-fact asserted by half the corpus
("coap, is_a, protocol" at 10^12 pages) would otherwise funnel every
evidence row through one reducer. Level 1 aggregates per (fact, salt
bucket); level 2 merges the <= ``salt_buckets`` partials, whose
payload is K-sliced, so level-2 state is bounded by K x buckets at
any support count. Level-1 state is the bucket's DISTINCT sources
(1/salt_buckets of the fact's source set — exact lexicographic
first-K and exact distinct counts are not computable from less), so
``salt_buckets`` is the lever when one fact's source set alone is
executor-memory-sized; support counts are constant-state
throughout. Counts stay exact."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triple_provenance(
    triples: DataFrame,
    k_sources: int = 5,
    salt_buckets: int = 32,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    source_col: str = "url",
) -> DataFrame:
    """triples (one row per sighting) -> one row per distinct fact:
    (subj, pred, obj, support, n_sources, sources) where ``sources`` is
    the lexicographically-first ``k_sources`` distinct source ids."""
    key = [F.col(subj_col).alias("subj"), F.col(pred_col).alias("pred"), F.col(obj_col).alias("obj")]
    salted = triples.select(
        *key,
        F.col(source_col).alias("src"),
        F.pmod(F.xxhash64(F.col(source_col)), F.lit(salt_buckets)).alias("__salt"),
    )
    # the salt is derived from the SOURCE id, so each distinct src
    # lands in exactly one bucket — per-bucket distinct counts sum to
    # the exact global distinct count (a random salt would overcount).
    # One collect_set serves both the K-slice and the distinct count:
    # a separate countDistinct would force Spark's extra two-pass
    # distinct-aggregate plan for a number that is just size(set).
    level1 = salted.groupBy("subj", "pred", "obj", "__salt").agg(
        F.count("*").alias("n"),
        F.array_sort(F.collect_set("src")).alias("srcset"),
    ).select(
        "subj",
        "pred",
        "obj",
        "n",
        F.slice("srcset", 1, k_sources).alias("srcs"),
        F.size("srcset").alias("nd"),
    )
    return level1.groupBy("subj", "pred", "obj").agg(
        F.sum("n").alias("support"),
        F.sum("nd").alias("n_sources"),
        F.slice(F.array_sort(F.array_distinct(F.flatten(F.collect_list("srcs")))), 1, k_sources).alias(
            "sources"
        ),
    )


def merge_provenance(
    old: DataFrame, delta: DataFrame, k_sources: int = 5
) -> DataFrame:
    """Incremental KG maintenance: merge a NEW batch's provenance table
    into the standing graph in one full-outer equi-join on the fact key
    — O(|old| + |delta|), no re-scan of historical sightings (the
    O(delta) story ``webtext.crawl_delta`` starts, finished at the
    graph table).

    Exactness contract: ``support`` adds exactly always. ``n_sources``
    adds exactly when the two tables' per-fact source sets are
    DISJOINT — true for crawl-snapshot batches whose source ids embed
    the crawl id (the layout ``jobs/run_pipeline.py`` produces); for
    overlapping batches re-aggregate from sightings instead, a
    distinct count is not mergeable from summaries. The K-slice
    ``sources`` sample merges EXACTLY regardless: every member of the
    union's lexicographic first-K is in one side's first-K, so
    first-K(first-K(a) ∪ first-K(b)) = first-K(a ∪ b)."""
    empty = F.array().cast("array<string>")
    o = old.select(
        "subj", "pred", "obj",
        F.col("support").alias("__os"),
        F.col("n_sources").alias("__on"),
        F.col("sources").alias("__osrc"),
    )
    d = delta.select(
        "subj", "pred", "obj",
        F.col("support").alias("__ds"),
        F.col("n_sources").alias("__dn"),
        F.col("sources").alias("__dsrc"),
    )
    return o.join(d, ["subj", "pred", "obj"], "full_outer").select(
        "subj",
        "pred",
        "obj",
        (F.coalesce("__os", F.lit(0)) + F.coalesce("__ds", F.lit(0))).alias("support"),
        (F.coalesce("__on", F.lit(0)) + F.coalesce("__dn", F.lit(0))).alias("n_sources"),
        F.slice(
            F.array_sort(
                F.array_distinct(
                    F.concat(F.coalesce("__osrc", empty), F.coalesce("__dsrc", empty))
                )
            ),
            1,
            k_sources,
        ).alias("sources"),
    )
