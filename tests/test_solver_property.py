"""Property-based check of the contradiction solver.

For UNARY constraints (every atom is var op const), satisfiability is
decidable by finite candidate enumeration: per variable it only matters
where the witness sits relative to the mentioned constants, so testing
every constant and every midpoint/outside point (c-0.5, c+0.5) is a
complete oracle. Hypothesis drives random clause systems through both
the DPLL solver and this oracle; they must always agree.
"""

from __future__ import annotations

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st

from coap_rfc_knowledge_graph_spark.functions.solver import check_sat

OPS = ["=", "!=", ">", ">=", "<", "<="]
VARS = ["x", "y"]
VALUES = [0.0, 1.0, 2.0]


def _holds(op: str, lhs: float, rhs: float) -> bool:
    return {
        "=": lhs == rhs,
        "!=": lhs != rhs,
        ">": lhs > rhs,
        ">=": lhs >= rhs,
        "<": lhs < rhs,
        "<=": lhs <= rhs,
    }[op]


def _oracle_sat(clauses) -> bool:
    """Exhaustive candidate-point enumeration (complete for unary atoms)."""
    candidates = sorted({v for v in VALUES} | {v - 0.5 for v in VALUES} | {v + 0.5 for v in VALUES})
    per_var = {v: candidates for v in VARS}
    for assignment in itertools.product(*(per_var[v] for v in VARS)):
        env = dict(zip(VARS, assignment))

        def clause_ok(connective, atoms):
            vals = [_holds(op, env[var], val) for var, op, val in atoms]
            if not vals:
                return True
            return all(vals) if connective == "AND" else any(vals)

        if all(clause_ok(c, a) for c, a in clauses):
            return True
    return False


atom_st = st.tuples(st.sampled_from(VARS), st.sampled_from(OPS), st.sampled_from(VALUES))
clause_st = st.tuples(st.sampled_from(["AND", "OR"]), st.lists(atom_st, min_size=1, max_size=4))
system_st = st.lists(clause_st, min_size=1, max_size=5)


@settings(max_examples=300, deadline=None)
@given(system_st)
def test_solver_agrees_with_enumeration_oracle(clauses):
    assert check_sat(clauses) == _oracle_sat(clauses)
