"""KG-embedding data prep: negative sampling (determinism,
partitioning invariance, draw independence, collision flagging) and
fixed-point co-occurrence strength, plus the DuckDB mirrors the driver
oracles run."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from coap_rfc_knowledge_graph_spark.operators.kg_embed import (  # noqa: E402
    cooccurrence_strength,
    negative_samples,
)


def _triples(spark, n=120):
    return spark.range(n).select(
        (F.col("id") % 37).alias("subj_id"),
        F.concat(F.lit("p"), (F.col("id") % 3).cast("string")).alias("pred"),
        ((F.col("id") * 5 + 2) % 37).alias("obj_id"),
    ).filter(F.col("subj_id") != F.col("obj_id")).distinct()


def test_negative_samples_shape_and_invariance(spark):
    t = _triples(spark)
    n_pos = t.count()
    out = negative_samples(t, k=3)
    rows = sorted(tuple(r) for r in out.collect())
    assert len(rows) == 3 * n_pos
    again = sorted(tuple(r) for r in negative_samples(t.repartition(7), k=3).collect())
    assert again == rows  # partitioning-independent draws


def test_negative_samples_semantics(spark):
    t = _triples(spark)
    ents = {
        r["e"]
        for r in t.select(F.col("subj_id").alias("e"))
        .union(t.select(F.col("obj_id").alias("e")))
        .distinct()
        .collect()
    }
    rows = negative_samples(t, k=2).collect()
    sides = {r["corrupt_side"] for r in rows}
    assert sides == {0, 1}  # both sides actually get corrupted
    repl_subj, repl_obj = set(), set()
    for r in rows:
        if r["corrupt_side"] == 0:
            assert r["neg_obj_id"] == r["obj_id"]  # untouched side passes through
            assert r["neg_subj_id"] in ents
            repl_subj.add(r["neg_subj_id"])
            assert r["collides"] == int(r["neg_subj_id"] == r["subj_id"])
        else:
            assert r["neg_subj_id"] == r["subj_id"]
            assert r["neg_obj_id"] in ents
            repl_obj.add(r["neg_obj_id"])
            assert r["collides"] == int(r["neg_obj_id"] == r["obj_id"])
    # draw independence (the r3 nsp ADVICE class): conditioning on the
    # side draw must not restrict which ranks the replacement draw can
    # reach — each side sees well over half the entity universe
    assert len(repl_subj) > len(ents) // 2
    assert len(repl_obj) > len(ents) // 2


def test_negative_samples_string_ids_rejected_cleanly(spark):
    # ids must be numeric (cast to long); a string id fails analysis
    # loudly at plan time rather than producing garbage draws
    t = spark.createDataFrame([("a", "p", "b")], "subj_id string, pred string, obj_id string")
    import pytest

    with pytest.raises(Exception):
        negative_samples(t, k=1).collect()


def test_cooccurrence_strength_exact(spark):
    t = spark.createDataFrame(
        [(1, "p0", 2), (1, "p1", 2), (1, "p0", 3), (4, "p0", 2)],
        "subj_id long, pred string, obj_id long",
    )
    got = {(r["subj_id"], r["obj_id"]): r for r in cooccurrence_strength(t).collect()}
    # N=4; (1,2): n_pair=2, n_subj=3, n_obj=3 -> floor(2*4*1e6/9)
    r = got[(1, 2)]
    assert (r["n_pair"], r["n_subj"], r["n_obj"]) == (2, 3, 3)
    assert r["strength"] == int(2 * 4 * 1_000_000 / 9)
    assert got[(4, 2)]["strength"] == int(1 * 4 * 1_000_000 / (1 * 3))


def test_driver_oracles_match_duckdb(spark):
    """Run the actual contract entries vs their DuckDB oracle SQL at
    sf0.001 — the same comparison the driver makes."""
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    qs, osql = entry.queries(), entry.oracle_sql()
    for name in ["kg_negative_samples", "entity_cooccurrence", "unicode_normalize"]:
        sdf = qs[name](spark, sf)
        cols = sorted(sdf.columns)
        got = sorted(tuple(r[c] for c in cols) for r in sdf.collect())
        pdf = con.execute(osql[name]).df()
        assert sorted(pdf.columns.tolist()) == cols
        want = sorted(tuple(row[c] for c in cols) for _, row in pdf.iterrows())
        assert got == want, name


def test_negative_samples_typed_respects_domain_range(spark):
    """Predicates with DISJOINT entity vocabularies: every corrupted
    subject must come from that pred's observed subjects, every
    corrupted object from its observed objects — never from another
    predicate's world; partitioning-invariant."""
    from coap_rfc_knowledge_graph_spark.operators.kg_embed import negative_samples_typed

    rows = []
    for i in range(40):  # pred pA: entities 0-19; pred pB: entities 100-119
        rows.append((i % 20, "pA", (i * 7 + 3) % 20))
        rows.append((100 + i % 20, "pB", 100 + (i * 11 + 5) % 20))
    t = spark.createDataFrame(rows, "subj_id long, pred string, obj_id long").filter(
        "subj_id <> obj_id"
    ).distinct()
    doms = {
        "pA": {r["subj_id"] for r in t.filter("pred = 'pA'").select("subj_id").collect()},
        "pB": {r["subj_id"] for r in t.filter("pred = 'pB'").select("subj_id").collect()},
    }
    rngs = {
        "pA": {r["obj_id"] for r in t.filter("pred = 'pA'").select("obj_id").collect()},
        "pB": {r["obj_id"] for r in t.filter("pred = 'pB'").select("obj_id").collect()},
    }
    out = negative_samples_typed(t, k=3).collect()
    assert len(out) == 3 * t.count()
    for r in out:
        if r["corrupt_side"] == 0:
            assert r["neg_subj_id"] in doms[r["pred"]], r
        else:
            assert r["neg_obj_id"] in rngs[r["pred"]], r
    again = sorted(tuple(x) for x in negative_samples_typed(t.repartition(7), k=3).collect())
    assert again == sorted(tuple(x) for x in out)
