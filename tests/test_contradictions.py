"""Q1-Q7 contradiction checks on hand-built rule tables with known
outcomes, plus an end-to-end pipeline smoke on synthetic pages."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from coap_rfc_knowledge_graph_spark.operators.contradictions import (
    check_conditional,
    check_direct_type1,
    check_direct_type2,
    check_direct_type3,
    check_entity_contradiction,
    check_single_rule_contradiction,
    literal_overlap,
)

_RULES_SCHEMA = (
    "url string, sent_id int, rule_num int, clause_id int, condition string, "
    "entity_id long, canonical string, sentence string, "
    "atoms array<struct<var:string,op:string,value_num:double>>, "
    "connective string, level string, rule_number int, rule_id string"
)


def _rule(url, rule_num, clause_id, condition, eid, name, atoms, connective="AND", n=1):
    return (
        url, rule_num * 10, rule_num, clause_id, condition, eid, name,
        f"sentence {rule_num}", atoms, connective, "STRONG", n, f"{name} rule {n}",
    )


@pytest.fixture(scope="module")
def rules_df(spark):
    rows = [
        # entity 1 "server": two directly contradicting unconditional rules
        _rule("u", 0, 0, "Entity rule", 1, "server", [("value", "=", 1.0)], n=1),
        _rule("u", 1, 0, "Entity rule", 1, "server", [("value", "=", 2.0)], n=2),
        # entity 2 "token": self-contradictory single rule + a sane rule
        # (the pair would be spuriously flagged by Q3 without the
        # reference's Q2-exclusion)
        _rule("u", 2, 0, "Entity rule", 2, "token", [("value", ">", 5.0), ("value", "<", 5.0)], n=1),
        _rule("u", 7, 0, "Entity rule", 2, "token", [("value", "=", 3.0)], n=2),
        # entity 3 "client": consistent rules
        _rule("u", 3, 0, "Entity rule", 3, "client", [("value", ">", 0.0)], n=1),
        _rule("u", 4, 0, "Entity rule", 3, "client", [("value", "<", 10.0)], n=2),
        # entity 4 "option": entity rule contradicts a consequent rule;
        # plus an antecedent rule for conditional checks
        _rule("u", 5, 0, "Entity rule", 4, "option", [("error", "=", 7.0)], n=1),
        _rule("u", 6, 0, "Antecedent rule", 4, "option", [("state", "=", 1.0)], n=2),
        _rule("u", 6, 1, "Consequent rule", 4, "option", [("error", "=", 8.0)], n=3),
    ]
    return spark.createDataFrame(rows, _RULES_SCHEMA)


@pytest.fixture(scope="module")
def flagged(spark, rules_df):
    return check_entity_contradiction(rules_df).persist()


def test_q1_flags_expected_entities(flagged):
    rows = flagged.collect()
    names = {r["canonical"] for r in rows}
    assert names == {"server", "token", "option"}
    # all three are PROVEN unsat, not branch-cap overflows
    assert {r["status"] for r in rows} == {"contradiction"}


def test_q1_branch_cap_overflow_reported_as_unverified(spark):
    """A rule set whose OR fan-out exceeds the solver branch cap must
    surface as status='unverified', distinguishable from a proven
    contradiction (rule set here is trivially satisfiable)."""
    rows = [
        _rule(
            "u", k, 0, "Entity rule", 9, "huge",
            [("v%d" % k, ">", 0.0), ("v%d" % k, ">", 1.0)], connective="OR", n=k + 1,
        )
        for k in range(18)  # 2^18 = 262144 > max_branches default 200k
    ]
    df = spark.createDataFrame(rows, _RULES_SCHEMA)
    got = check_entity_contradiction(df).collect()
    assert len(got) == 1
    assert got[0]["canonical"] == "huge"
    assert got[0]["status"] == "unverified"


def test_q2_single_rule(rules_df, flagged):
    got = {r["rule_id"] for r in check_single_rule_contradiction(rules_df, flagged).collect()}
    assert got == {"token rule 1"}


def test_q3_direct_type1(rules_df, flagged):
    got = {(r["rule_a"], r["rule_b"]) for r in check_direct_type1(rules_df, flagged).collect()}
    # without exclusion the self-contradictory token rule pollutes pairs
    assert got == {("server rule 1", "server rule 2"), ("token rule 1", "token rule 2")}


def test_q3_exclusion_of_single_rule_contradictions(rules_df, flagged):
    bad = check_single_rule_contradiction(rules_df, flagged)
    got = check_direct_type1(rules_df, flagged, exclude_rules=bad).collect()
    assert {(r["rule_a"], r["rule_b"]) for r in got} == {("server rule 1", "server rule 2")}


def test_q4_direct_type2(rules_df, flagged):
    got = {(r["canonical"], r["rule_a"], r["rule_b"]) for r in check_direct_type2(rules_df, flagged).collect()}
    assert got == {("option", "option rule 1", "option rule 3")}


def test_q5_direct_type3(spark, rules_df):
    # two consequents of one antecedent that contradict each other
    edges = spark.createDataFrame(
        [
            ("option rule 2", "option rule 1", "condition"),
            ("option rule 2", "option rule 3", "condition"),
        ],
        "src string, dst string, relation string",
    )
    got = {(r["rule_a"], r["rule_b"]) for r in check_direct_type3(rules_df, edges).collect()}
    assert got == {("option rule 1", "option rule 3")}


def test_q5_exclusion(spark, rules_df, flagged):
    # antecedent with two consequents, one self-contradictory: the pair
    # is unsat only because of the Q2-flagged rule -> excluded
    edges = spark.createDataFrame(
        [
            ("option rule 2", "token rule 1", "condition"),
            ("option rule 2", "server rule 1", "condition"),
        ],
        "src string, dst string, relation string",
    )
    bad = check_single_rule_contradiction(rules_df, flagged)
    assert check_direct_type3(rules_df, edges).count() == 1
    assert check_direct_type3(rules_df, edges, exclude_rules=bad).count() == 0


def test_query_stage_excludes_self_contradictory_rules(spark, rules_df):
    """e2e: query_stage must pass Q2 findings as exclusions to all four
    pairwise checks (ADVICE r1; ref CoAP_contradiction_checking.py:603,
    734,824,925)."""
    from coap_rfc_knowledge_graph_spark.plans.pipeline import KGResult, query_stage

    res = KGResult(
        sentences=rules_df, rule_sentences=rules_df, mentions=rules_df, triples=rules_df
    )
    res.rules = rules_df
    res.edges = spark.createDataFrame(
        [
            ("option rule 2", "token rule 1", "condition"),
            ("option rule 2", "server rule 1", "condition"),
        ],
        "src string, dst string, relation string",
    )
    res = query_stage(res)
    d1 = {(r["rule_a"], r["rule_b"]) for r in res.findings["direct_type_1"].collect()}
    assert ("server rule 1", "server rule 2") in d1
    assert ("token rule 1", "token rule 2") not in d1
    assert res.findings["direct_type_3"].count() == 0


def test_q6_conditional_no_false_positive(rules_df, flagged):
    # option's entity rule (error=7) vs antecedent rule (state=1): sat together
    assert check_conditional(rules_df, flagged).count() == 0


def test_q7_literal_overlap(rules_df):
    got = {(r["rule_a"], r["rule_b"], r["var"]) for r in literal_overlap(rules_df).collect()}
    assert ("server rule 1", "server rule 2", "value") in got
    assert ("option rule 1", "option rule 3", "error") in got
    # no cross-entity pairs
    assert all(a.split(" rule")[0] == b.split(" rule")[0] for a, b, _ in got)


def test_contradiction_probes_drive_all_finding_kinds(spark):
    """The probe pages must produce findings in each Q2/Q4/Q5/Q6 family
    through the FULL pipeline (they back the driver-contract
    kg_single_rule/kg_direct_type*/kg_conditional entries). Q5 and Q6
    each need >=3 rows — one per probe shape — so the solver paths are
    exercised beyond a single case (OR connective, multi-atom range
    clause; VERDICT r2 item 8), with the per-probe pairs pinned."""
    from coap_rfc_knowledge_graph_spark.operators.rule_filter import rule_sentences
    from coap_rfc_knowledge_graph_spark.plans.pipeline import (
        extract_stage,
        query_stage,
        rules_stage,
    )
    from coap_rfc_knowledge_graph_spark.sources.pages import contradiction_probe_pages

    res = extract_stage(contradiction_probe_pages(spark), url_partitions=2)
    # single-sentence probe docs: keep the first modal match
    res.rule_sentences = rule_sentences(res.sentences, drop_boilerplate=False)
    res = query_stage(rules_stage(res))
    counts = {k: df.count() for k, df in res.findings.items()}
    assert counts["single_rule_contradictions"] >= 1, counts
    assert counts["direct_type_1"] >= 0  # Q3 comes from the corpus, not probes
    assert counts["direct_type_2"] >= 1, counts
    assert counts["direct_type_3"] >= 3, counts
    assert counts["conditional"] >= 3, counts
    # one Q5 pair per probe shape: AND point-pair (topic), OR negated
    # pair (frame), range-vs-point (payload scan)
    q5_ents = {r["rule_a"].rsplit(" rule", 1)[0] for r in res.findings["direct_type_3"].collect()}
    assert {"topic", "frame", "payload scan"} <= q5_ents, q5_ents
    # one Q6 pair per probe entity
    q6_ents = {r["canonical"] for r in res.findings["conditional"].collect()}
    assert {"session", "link", "connection"} <= q6_ents, q6_ents


def test_pipeline_end_to_end(spark):
    from coap_rfc_knowledge_graph_spark.plans.pipeline import (
        canonical_triples,
        extract_stage,
        rules_stage,
        query_stage,
    )
    from coap_rfc_knowledge_graph_spark.sources.pages import synthetic_pages

    pages = synthetic_pages(spark, 20, seed=3)
    res = query_stage(rules_stage(extract_stage(pages, url_partitions=4)))
    assert res.rules.count() > 0
    assert res.nodes.count() > 0
    assert res.edges.filter(F.col("relation") == "condition").count() > 0
    ct = canonical_triples(res)
    assert ct.count() == res.triples.count()
    assert set(ct.columns) == {"subj_id", "subj", "pred", "obj_id", "obj", "url", "sent_id"}
    # findings are computable (values depend on synthetic corpus content)
    for name, df in res.findings.items():
        assert df.count() >= 0, name
