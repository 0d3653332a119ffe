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

from dataclasses import dataclass, field

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
from ..operators.linking import canonicalize_variables, link_surfaces, surface_to_entity
from ..operators.mentions import extract_mentions
from ..operators.pairs import generate_pairs_from_arrays
from ..operators.properties import parse_atomic_rules
from ..operators.relations import extract_triples
from ..operators.rule_filter import rule_sentences
from ..operators.rules import build_edges, build_nodes, build_rules, encode_values
from ..operators.sentences import extract_sentences


@dataclass
class KGResult:
    sentences: DataFrame
    rule_sentences: DataFrame
    mentions: DataFrame
    triples: DataFrame
    entities: DataFrame
    rules: DataFrame | None = None
    nodes: DataFrame | None = None
    edges: DataFrame | None = None
    findings: dict[str, DataFrame] = field(default_factory=dict)


def extract_stage(pages: DataFrame, url_partitions: int | None = None) -> KGResult:
    """EP1+EP2: pages -> sentences/rule_sentences/mentions/triples +
    canonical entities. Pure transformations — nothing is executed here."""
    sentences = extract_sentences(pages, url_partitions=url_partitions)
    sentences = sentences.persist()  # feeds 4 downstream branches
    rules_s = rule_sentences(sentences)
    mentions_arr = extract_mentions(sentences, explode=False).persist()
    mentions = mentions_arr.select(
        "url", "sent_id", F.explode("mentions").alias("m")
    ).select("url", "sent_id", "m.begin", "m.end", "m.surface")
    pairs = generate_pairs_from_arrays(mentions_arr)
    triples = extract_triples(pairs)
    from ..operators.linking import canonical_entities  # local: avoids cycle

    entities = canonical_entities(mentions)
    return KGResult(
        sentences=sentences,
        rule_sentences=rules_s,
        mentions=mentions,
        triples=triples,
        entities=entities,
    )


def canonical_triples(result: KGResult) -> DataFrame:
    """Rewrite triples' surfaces to canonical entity ids (N4 over both
    subj and obj): triples_canonical(subj_id, subj, pred, obj_id, obj,
    url, sent_id). Broadcast surface->entity map; zero shuffle of
    triples."""
    t = result.triples
    subj_map = link_surfaces(t.select(F.lower("subj").alias("surface")), result.entities)
    obj_map = link_surfaces(t.select(F.lower("obj").alias("surface")), result.entities)
    subj_b = F.broadcast(
        subj_map.select(
            F.col("surface").alias("subj_key"),
            F.col("entity_id").alias("subj_id"),
            F.col("canonical").alias("subj_canonical"),
        )
    )
    obj_b = F.broadcast(
        obj_map.select(
            F.col("surface").alias("obj_key"),
            F.col("entity_id").alias("obj_id"),
            F.col("canonical").alias("obj_canonical"),
        )
    )
    return (
        t.join(subj_b, F.lower(t["subj"]) == F.col("subj_key"))
        .join(obj_b, F.lower(t["obj"]) == F.col("obj_key"))
        .select(
            "subj_id",
            F.col("subj_canonical").alias("subj"),
            "pred",
            "obj_id",
            F.col("obj_canonical").alias("obj"),
            "url",
            "sent_id",
        )
    )


def rules_stage(result: KGResult) -> KGResult:
    """EP3 steps 1-6: clauses -> behaviours -> atomic rules -> linked,
    variable-canonicalized, value-encoded rules -> graph tables."""
    clauses = split_conditions(with_context(result.rule_sentences, result.sentences))
    behaviours = generate_behaviours(clauses, result.mentions)
    atomic = parse_atomic_rules(behaviours)

    # N4: link each atomic rule's entity surface to its canonical entity
    link = link_surfaces(
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
    bad_rules = check_single_rule_contradiction(result.rules, flagged)
    result.findings = {
        "entity_contradictions": flagged,
        "single_rule_contradictions": bad_rules,
        "direct_type_1": check_direct_type1(result.rules, flagged),
        "direct_type_2": check_direct_type2(result.rules, flagged),
        "direct_type_3": check_direct_type3(result.rules, result.edges),
        "conditional": check_conditional(result.rules, flagged),
    }
    return result


def run_pipeline(pages: DataFrame, url_partitions: int | None = None) -> KGResult:
    """Full EP1->EP3 chain (lazy; caller materializes)."""
    return query_stage(rules_stage(extract_stage(pages, url_partitions=url_partitions)))
