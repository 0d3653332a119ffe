"""End-to-end KG-construction pipeline (EP1-EP3, SURVEY §3).

One lazy DataFrame program per stage boundary; each stage returns a
DataFrame so callers can materialize where they choose (tests collect,
production writes each to a table — see ``checkpointing.py`` for the
manifest/resume wrapper).

Dataflow (north rule):

    pages ──extract_sentences──> sentences ──rule_sentences──> rules_s
      sentences ──extract_mentions──> mentions
      mentions x sentences ──generate_pairs──> pairs ──extract_triples──> triples
      rules_s ──split_conditions──> clauses ──generate_behaviours──> behaviours
      behaviours ──parse_atomic_rules──> atomic
      mentions ──canonical_entities──> entities ; link entity_surface -> entity_id
      atomic+entities ──canonicalize_variables / encode_values──> atomic_linked
      atomic_linked ──build_rules──> rules ──build_nodes/build_edges──> graph
      rules ──Q1..Q6──> findings

Shuffle budget at scale (the plan we want, verified via .explain in
tests/test_plans.py): one url-repartition feeding sentences; the window
stages and the pair self-join reuse that url partitioning; dictionary-
sized stages (entity canonicalization, value dictionary) shuffle only
dictionary rows; every join back to corpus-sized tables is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.conditions import generate_behaviours, split_conditions, with_context
from ..operators.contradictions import (
    check_conditional,
    check_direct_type1,
    check_direct_type2,
    check_direct_type3,
    check_entity_contradiction,
    check_single_rule_contradiction,
)
from ..operators.linking import (
    canonicalize_variables,
    link_surfaces_auto,
    salted_top1_join,
    surface_to_entity,
)
from ..operators.mentions import extract_mentions
from ..operators.properties import parse_atomic_rules
from ..operators.relations import extract_triples_from_arrays
from ..operators.rule_filter import rule_sentences
from ..operators.rules import build_edges, build_nodes, build_rules, encode_values
from ..operators.sentences import extract_sentences


class KGResult:
    """Stage-output bundle. ``entities`` is LAZY: the canonicalization
    path contains driver-side eager work (dictionary collect + greedy
    resolve), so it only runs when a consumer actually needs the entity
    dictionary — the triples-only flagship never pays for it."""

    def __init__(
        self,
        sentences: DataFrame,
        rule_sentences: DataFrame,
        mentions: DataFrame,
        triples: DataFrame,
        entities: DataFrame | None = None,
        entities_fn=None,
    ):
        self.sentences = sentences
        self.rule_sentences = rule_sentences
        self.mentions = mentions
        self.triples = triples
        self._entities = entities
        self._entities_fn = entities_fn
        self.rules: DataFrame | None = None
        self.nodes: DataFrame | None = None
        self.edges: DataFrame | None = None
        self.findings: dict[str, DataFrame] = {}

    @property
    def entities(self) -> DataFrame:
        if self._entities is None:
            if self._entities_fn is None:
                raise ValueError("KGResult has neither entities nor entities_fn")
            self._entities = self._entities_fn()
        return self._entities


def extract_stage(pages: DataFrame, url_partitions: int | None = None) -> KGResult:
    """EP1+EP2: pages -> sentences/rule_sentences/mentions/triples +
    canonical entities. Pure transformations — nothing is executed here."""
    sentences = extract_sentences(pages, url_partitions=url_partitions)
    sentences = sentences.persist()  # feeds 4 downstream branches
    rules_s = rule_sentences(sentences)
    mentions_arr = extract_mentions(sentences, explode=False).persist()
    from ..operators.mentions import _explode_mentions

    mentions = _explode_mentions(mentions_arr)  # explode_outer: no UDF re-eval
    triples = extract_triples_from_arrays(mentions_arr)
    from ..operators.linking import canonical_entities  # local: avoids cycle

    return KGResult(
        sentences=sentences,
        rule_sentences=rules_s,
        mentions=mentions,
        triples=triples,
        entities_fn=lambda: canonical_entities(mentions),
    )


def canonical_triples(result: KGResult, max_broadcast_entities: int | None = None) -> DataFrame:
    """Rewrite triples' surfaces to canonical entity ids (N4 over both
    subj and obj): triples_canonical(subj_id, subj, pred, obj_id, obj,
    url, sent_id). The surface->entity maps come from
    ``link_surfaces_auto`` (broadcast matmul vs distributed argmax by
    dictionary size); the join-back to the corpus-sized triples is
    broadcast while the map fits the budget, salted shuffle otherwise."""
    from ..config import DICTIONARY_BROADCAST_MAX_ROWS
    from ..operators.linking import _entity_count_hint

    budget = DICTIONARY_BROADCAST_MAX_ROWS if max_broadcast_entities is None else max_broadcast_entities
    t = result.triples
    entities = result.entities
    broadcast_ok = _entity_count_hint(entities) <= budget
    subj_map = link_surfaces_auto(
        t.select(F.lower("subj").alias("surface")), entities, max_broadcast_entities=budget
    ).select(
        F.col("surface").alias("subj_key"),
        F.col("entity_id").alias("subj_id"),
        F.col("canonical").alias("subj_canonical"),
        F.col("sim").alias("subj_sim"),
    )
    obj_map = link_surfaces_auto(
        t.select(F.lower("obj").alias("surface")), entities, max_broadcast_entities=budget
    ).select(
        F.col("surface").alias("obj_key"),
        F.col("entity_id").alias("obj_id"),
        F.col("canonical").alias("obj_canonical"),
        F.col("sim").alias("obj_sim"),
    )
    if broadcast_ok:
        joined = t.join(F.broadcast(subj_map), F.lower(t["subj"]) == F.col("subj_key")).join(
            F.broadcast(obj_map), F.lower(t["obj"]) == F.col("obj_key")
        )
    else:
        joined = salted_top1_join(
            t.withColumn("subj_key", F.lower("subj")), subj_map, key="subj_key", order_col="subj_sim"
        )
        joined = salted_top1_join(
            joined.withColumn("obj_key", F.lower("obj")), obj_map, key="obj_key", order_col="obj_sim"
        )
    return joined.select(
        "subj_id",
        F.col("subj_canonical").alias("subj"),
        "pred",
        "obj_id",
        F.col("obj_canonical").alias("obj"),
        "url",
        "sent_id",
    )


def rules_stage(result: KGResult) -> KGResult:
    """EP3 steps 1-6: clauses -> behaviours -> atomic rules -> linked,
    variable-canonicalized, value-encoded rules -> graph tables."""
    clauses = split_conditions(with_context(result.rule_sentences, result.sentences))
    behaviours = generate_behaviours(clauses, result.mentions)
    atomic = parse_atomic_rules(behaviours)

    # N4: link each atomic rule's entity surface to its canonical entity
    # (atomic is rule-sentence-sized — far smaller than mentions — so the
    # broadcast join-back below is safe even when the link itself runs
    # the distributed path)
    link = link_surfaces_auto(
        atomic.select(F.col("entity_surface").alias("surface")), result.entities
    ).select(
        F.col("surface").alias("entity_surface"),
        "entity_id",
        F.col("canonical"),
    )
    atomic = atomic.join(F.broadcast(link), on="entity_surface")

    # N5: per-entity variable canonicalization, joined back broadcast
    var_map = canonicalize_variables(atomic.select("entity_id", "var"))
    atomic = atomic.join(F.broadcast(var_map), on=["entity_id", "var"], how="left").withColumn(
        "canonical_var", F.coalesce("canonical_var", "var")
    )

    # N7 + N8-N10
    atomic = encode_values(atomic)
    rules = build_rules(atomic).persist()
    result.rules = rules
    result.nodes = build_nodes(result.entities, rules)
    result.edges = build_edges(rules)
    return result


def query_stage(result: KGResult) -> KGResult:
    """EP3 step 7: the six contradiction checks."""
    assert result.rules is not None and result.edges is not None
    flagged = check_entity_contradiction(result.rules).persist()
    bad_rules = check_single_rule_contradiction(result.rules, flagged).persist()
    # the reference excludes Q2-flagged (self-contradictory) rules from
    # ALL FOUR pairwise checks (CoAP_contradiction_checking.py:603,734,
    # 824,925) — a self-contradictory rule is unsat against anything.
    result.findings = {
        "entity_contradictions": flagged,
        "single_rule_contradictions": bad_rules,
        "direct_type_1": check_direct_type1(result.rules, flagged, exclude_rules=bad_rules),
        "direct_type_2": check_direct_type2(result.rules, flagged, exclude_rules=bad_rules),
        "direct_type_3": check_direct_type3(result.rules, result.edges, exclude_rules=bad_rules),
        "conditional": check_conditional(result.rules, flagged, exclude_rules=bad_rules),
    }
    return result


def run_pipeline(pages: DataFrame, url_partitions: int | None = None) -> KGResult:
    """Full EP1->EP3 chain (lazy; caller materializes)."""
    return query_stage(rules_stage(extract_stage(pages, url_partitions=url_partitions)))
