"""Q1-Q7: contradiction checking — the reference's "query engine".

Reference structure (``src/CoAP_contradiction_checking.py:490-1002``;
identical across the MQTT/AMQP variants): all checks compile an entity's
rules to Real-literal clauses and test unsat:

- Q1 entity-level: conjoin ALL rules of an entity (``:490-538``)
- Q2 single-rule: each flagged entity's rules individually (``:543-588``)
- Q3 direct type-1: pairwise among unconditional ("Entity rule") rules,
  excluding Q2-flagged rules (``:595-682``)
- Q4 direct type-2: entity rules x consequent rules pairwise (``:727-811``)
- Q5 direct type-3: per antecedent, pairwise among its consequents via
  'condition' edges (``:816-913``)
- Q6 conditional: entity rules x antecedent rules pairwise (``:918-1002``)
- Q7 literal-overlap diagnostic: shared variables between rules
  (``:687-724``) — a pure equi-self-join, fully native.

Spark shape: one ``groupBy(entity_id).applyInPandas`` per check family —
each group is ONE entity's rules (small), the solver runs vectorized
per group, and entities are checked in parallel across executors. The
rule payload travels as a JSON column (stable across Arrow versions).
Q7 never enters Python at all.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.solver import Clause, check_sat

# ----------------------------------------------------------------------------


def _rules_payload(rules: DataFrame) -> DataFrame:
    """Project the rules table to the solver's input: one JSON clause per
    rule row. Keys the grouped-map stages below; native projection."""
    return rules.select(
        "entity_id",
        "canonical",
        "rule_id",
        "condition",
        "url",
        "rule_num",
        F.to_json(F.struct("connective", "atoms")).alias("clause_json"),
    )


def _clause(row_json: str) -> Clause:
    obj = json.loads(row_json)
    atoms = [
        (a["var"], a["op"], float(a["value_num"]))
        for a in obj.get("atoms", [])
        if a.get("value_num") is not None
    ]
    return (obj.get("connective", "AND"), atoms)


# --- Q1 -----------------------------------------------------------------------

_ENTITY_SCHEMA = T.StructType(
    [
        T.StructField("entity_id", T.LongType()),
        T.StructField("canonical", T.StringType()),
        T.StructField("n_rules", T.IntegerType()),
        T.StructField("status", T.StringType()),
    ]
)


def check_entity_contradiction(rules: DataFrame) -> DataFrame:
    """Q1: entities whose full rule set is unsatisfiable.
    -> contradiction_entities(entity_id, canonical, n_rules, status).

    ``status`` distinguishes a proven ``'contradiction'`` from an
    ``'unverified'`` solver branch-cap overflow: an entity whose rule
    set is too complex to verify needs review, but must not be
    indistinguishable from a genuinely unsatisfiable one downstream."""

    def per_entity(pdf: pd.DataFrame) -> pd.DataFrame:
        clauses = [_clause(c) for c in pdf["clause_json"]]
        status = "contradiction"
        try:
            sat = check_sat(clauses)
        except ValueError:
            # branch-cap overflow (only reachable here: the pairwise
            # checks solve 2 clauses at a time). Scope the failure to
            # THIS entity instead of killing the job, and emit it as a
            # review finding — the opposite of a silent pass.
            sat = False
            status = "unverified"
        if sat:
            return pd.DataFrame(columns=["entity_id", "canonical", "n_rules", "status"]).astype(
                {"entity_id": "int64", "canonical": "object", "n_rules": "int32", "status": "object"}
            )
        return pd.DataFrame(
            {
                "entity_id": [pdf["entity_id"].iloc[0]],
                "canonical": [pdf["canonical"].iloc[0]],
                "n_rules": pd.array([len(pdf)], dtype="int32"),
                "status": [status],
            }
        )

    return _rules_payload(rules).groupBy("entity_id").applyInPandas(per_entity, _ENTITY_SCHEMA)


# --- Q2 -----------------------------------------------------------------------

_RULE_SCHEMA = T.StructType(
    [
        T.StructField("entity_id", T.LongType()),
        T.StructField("rule_id", T.StringType()),
    ]
)


def check_single_rule_contradiction(rules: DataFrame, flagged: DataFrame) -> DataFrame:
    """Q2: per-rule self-contradiction among flagged entities' rules.
    -> contradiction_rules(entity_id, rule_id). The flagged set is
    dictionary-sized -> broadcast semi-join, no shuffle of rules."""
    scoped = _rules_payload(rules).join(
        F.broadcast(flagged.select("entity_id")), on="entity_id", how="leftsemi"
    )

    def per_entity(pdf: pd.DataFrame) -> pd.DataFrame:
        bad = [
            (pdf["entity_id"].iloc[k], pdf["rule_id"].iloc[k])
            for k in range(len(pdf))
            if not check_sat([_clause(pdf["clause_json"].iloc[k])])
        ]
        return pd.DataFrame(bad, columns=["entity_id", "rule_id"])

    return scoped.groupBy("entity_id").applyInPandas(per_entity, _RULE_SCHEMA)


# --- Q3/Q4/Q6 shared pairwise driver ------------------------------------------

_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("entity_id", T.LongType()),
        T.StructField("canonical", T.StringType()),
        T.StructField("rule_a", T.StringType()),
        T.StructField("rule_b", T.StringType()),
        T.StructField("kind", T.StringType()),
    ]
)


def _pairwise_check(scoped: DataFrame, side_a: str, side_b: str, kind: str) -> DataFrame:
    """Grouped-map pairwise unsat: rules with condition == side_a vs
    condition == side_b of the same entity (side_a == side_b -> i<j
    combinations)."""

    def per_entity(pdf: pd.DataFrame) -> pd.DataFrame:
        rows_a = pdf[pdf["condition"] == side_a]
        rows_b = pdf[pdf["condition"] == side_b]
        out = []
        ent = pdf["entity_id"].iloc[0]
        name = pdf["canonical"].iloc[0]
        if side_a == side_b:
            items = list(zip(rows_a["rule_id"], rows_a["clause_json"]))
            pairs = [
                (items[i], items[j])
                for i in range(len(items))
                for j in range(i + 1, len(items))
            ]
        else:
            pairs = [
                (a, b)
                for a in zip(rows_a["rule_id"], rows_a["clause_json"])
                for b in zip(rows_b["rule_id"], rows_b["clause_json"])
                if a[0] != b[0]
            ]
        for (ra, ca), (rb, cb) in pairs:
            if not check_sat([_clause(ca), _clause(cb)]):
                out.append((ent, name, ra, rb, kind))
        return pd.DataFrame(out, columns=["entity_id", "canonical", "rule_a", "rule_b", "kind"])

    return scoped.groupBy("entity_id").applyInPandas(per_entity, _PAIR_SCHEMA)


def _scope(rules: DataFrame, flagged: DataFrame, exclude_rules: DataFrame | None) -> DataFrame:
    scoped = _rules_payload(rules).join(
        F.broadcast(flagged.select("entity_id")), on="entity_id", how="leftsemi"
    )
    if exclude_rules is not None:
        scoped = scoped.join(
            F.broadcast(exclude_rules.select("rule_id")), on="rule_id", how="leftanti"
        )
    return scoped


def check_direct_type1(rules: DataFrame, flagged: DataFrame, exclude_rules: DataFrame | None = None) -> DataFrame:
    """Q3: pairwise among unconditional rules of flagged entities."""
    return _pairwise_check(_scope(rules, flagged, exclude_rules), "Entity rule", "Entity rule", "direct_type_1")


def check_direct_type2(rules: DataFrame, flagged: DataFrame, exclude_rules: DataFrame | None = None) -> DataFrame:
    """Q4: entity rules x consequent rules pairwise."""
    return _pairwise_check(_scope(rules, flagged, exclude_rules), "Entity rule", "Consequent rule", "direct_type_2")


def check_conditional(rules: DataFrame, flagged: DataFrame, exclude_rules: DataFrame | None = None) -> DataFrame:
    """Q6: entity rules x antecedent rules pairwise."""
    return _pairwise_check(_scope(rules, flagged, exclude_rules), "Entity rule", "Antecedent rule", "conditional")


# --- Q5: consequents of one antecedent ----------------------------------------

_Q5_SCHEMA = T.StructType(
    [
        T.StructField("antecedent", T.StringType()),
        T.StructField("rule_a", T.StringType()),
        T.StructField("rule_b", T.StringType()),
        T.StructField("kind", T.StringType()),
    ]
)


def check_direct_type3(rules: DataFrame, edges: DataFrame, exclude_rules: DataFrame | None = None) -> DataFrame:
    """Q5: for each antecedent rule-node, pairwise unsat among its
    consequent neighbours (condition edges). The edge join keys the
    grouped check by antecedent instead of entity — same grouped-map
    pattern, different partition key. ``exclude_rules`` drops Q2-flagged
    (self-contradictory) rules, as the reference does for every pairwise
    check (``src/CoAP_contradiction_checking.py:603,734,824,925``)."""
    cond = edges.filter(F.col("relation") == "condition").select(
        F.col("src").alias("antecedent"), F.col("dst").alias("rule_id")
    )
    payload = _rules_payload(rules).select("rule_id", "clause_json")
    scoped = cond.join(payload, on="rule_id")
    if exclude_rules is not None:
        scoped = scoped.join(
            F.broadcast(exclude_rules.select("rule_id")), on="rule_id", how="leftanti"
        )

    def per_ante(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        ante = pdf["antecedent"].iloc[0]
        items = list(zip(pdf["rule_id"], pdf["clause_json"]))
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                (ra, ca), (rb, cb) = items[i], items[j]
                if not check_sat([_clause(ca), _clause(cb)]):
                    out.append((ante, ra, rb, "direct_type_3"))
        return pd.DataFrame(out, columns=["antecedent", "rule_a", "rule_b", "kind"])

    return scoped.groupBy("antecedent").applyInPandas(per_ante, _Q5_SCHEMA)


# --- Q7: literal overlap (fully native) ---------------------------------------


def literal_overlap(rules: DataFrame) -> DataFrame:
    """Q7: pairs of rules of one entity sharing a variable — explode the
    atom vars and equi-self-join on (entity_id, var); Catalyst plans a
    shuffled hash join on dictionary-sized keys. No Python."""
    vars_df = rules.select(
        "entity_id", "rule_id", F.explode("atoms").alias("a")
    ).select("entity_id", "rule_id", F.col("a.var").alias("var")).distinct()
    a = vars_df.select("entity_id", "var", F.col("rule_id").alias("rule_a"))
    b = vars_df.select("entity_id", "var", F.col("rule_id").alias("rule_b"))
    return (
        a.join(b, on=["entity_id", "var"])
        .filter(F.col("rule_a") < F.col("rule_b"))
        .select("entity_id", "var", "rule_a", "rule_b")
    )
