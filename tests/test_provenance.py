"""Triple provenance: two-level salted aggregation equals the naive
single groupBy (counts exact, K-sliced source sample), state bound
holds on a mega-fact, driver oracle matches DuckDB."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from coap_rfc_knowledge_graph_spark.operators.provenance import triple_provenance  # noqa: E402


def _sightings(spark, n=300):
    return spark.range(n).select(
        (F.col("id") % 13).alias("subj"),
        F.concat(F.lit("p"), (F.col("id") % 2).cast("string")).alias("pred"),
        ((F.col("id") * 3 + 1) % 13).alias("obj"),
        F.concat(F.lit("u"), (F.col("id") % 29).cast("string")).alias("url"),
    ).filter(F.col("subj") != F.col("obj"))


def test_matches_naive_aggregation(spark):
    s = _sightings(spark)
    got = {
        (r["subj"], r["pred"], r["obj"]): r
        for r in triple_provenance(s, k_sources=3, salt_buckets=4).collect()
    }
    naive = {
        (r["subj"], r["pred"], r["obj"]): r
        for r in s.groupBy("subj", "pred", "obj")
        .agg(
            F.count("*").alias("support"),
            F.countDistinct("url").alias("n_sources"),
            F.slice(F.array_sort(F.collect_set("url")), 1, 3).alias("sources"),
        )
        .collect()
    }
    assert set(got) == set(naive)
    for k, r in got.items():
        assert (r["support"], r["n_sources"]) == (naive[k]["support"], naive[k]["n_sources"]), k
        assert r["sources"] == naive[k]["sources"], k
        assert len(r["sources"]) <= 3


def test_mega_fact_and_invariance(spark):
    """One fact asserted by every row (head skew): counts stay exact,
    the sample stays K-bounded and lexicographically-first, output is
    partitioning-independent."""
    s = spark.range(5000).select(
        F.lit(7).alias("subj"),
        F.lit("is_a").alias("pred"),
        F.lit(9).alias("obj"),
        F.concat(F.lit("u"), (F.col("id") % 997).cast("string")).alias("url"),
    )
    r = triple_provenance(s, k_sources=5, salt_buckets=8).collect()
    assert len(r) == 1
    row = r[0]
    assert row["support"] == 5000 and row["n_sources"] == 997
    assert row["sources"] == sorted((f"u{i}" for i in range(997)))[:5]
    again = triple_provenance(s.repartition(11), k_sources=5, salt_buckets=8).collect()[0]
    assert tuple(again) == tuple(row)


def test_driver_oracle_matches_duckdb(spark):
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    sdf = entry.queries()["triple_provenance"](spark, sf)
    cols = sorted(sdf.columns)
    got = sorted(tuple(str(r[c]) for c in cols) for r in sdf.collect())
    pdf = con.execute(entry.oracle_sql()["triple_provenance"]).df()
    want = sorted(tuple(str(row[c]) for c in cols) for _, row in pdf.iterrows())
    assert got == want


def test_merge_provenance_matched_and_one_sided(spark):
    from coap_rfc_knowledge_graph_spark.operators.provenance import merge_provenance

    schema = "subj long, pred string, obj long, support long, n_sources long, sources array<string>"
    old = spark.createDataFrame(
        [
            (1, "p", 2, 10, 3, ["a1", "a2", "a9"]),
            (3, "p", 4, 1, 1, ["a5"]),
        ],
        schema,
    )
    delta = spark.createDataFrame(
        [
            (1, "p", 2, 4, 2, ["b0", "b7"]),
            (5, "q", 6, 2, 1, ["b1"]),
        ],
        schema,
    )
    got = {(r.subj, r.pred, r.obj): r for r in merge_provenance(old, delta, k_sources=4).collect()}
    assert set(got) == {(1, "p", 2), (3, "p", 4), (5, "q", 6)}
    m = got[(1, "p", 2)]
    # support/n_sources add; first-K of the union is exact
    assert (m.support, m.n_sources) == (14, 5)
    assert m.sources == ["a1", "a2", "a9", "b0"]
    assert (got[(3, "p", 4)].support, got[(3, "p", 4)].sources) == (1, ["a5"])
    assert (got[(5, "q", 6)].n_sources, got[(5, "q", 6)].sources) == (1, ["b1"])


def test_merge_provenance_first_k_exactness_property(spark):
    """first-K(first-K(a) ∪ first-K(b)) == first-K(a ∪ b) — the claim
    the docstring makes, checked against brute force over random-ish
    deterministic source sets."""
    from coap_rfc_knowledge_graph_spark.operators.provenance import (
        merge_provenance,
        triple_provenance,
    )
    from pyspark.sql import functions as F

    i = F.col("id")
    a = spark.range(300).select(
        F.lit(1).alias("subj"), F.lit("p").alias("pred"), F.lit(2).alias("obj"),
        F.concat(F.lit("s"), F.pmod(i * 48271, F.lit(97)).cast("string")).alias("url"),
    )
    b = spark.range(300).select(
        F.lit(1).alias("subj"), F.lit("p").alias("pred"), F.lit(2).alias("obj"),
        F.concat(F.lit("t"), F.pmod(i * 16807, F.lit(89)).cast("string")).alias("url"),
    )
    merged = merge_provenance(
        triple_provenance(a, k_sources=5), triple_provenance(b, k_sources=5), k_sources=5
    ).collect()[0]
    brute = sorted({f"s{(j * 48271) % 97}" for j in range(300)}
                   | {f"t{(j * 16807) % 89}" for j in range(300)})[:5]
    assert merged.sources == brute
    assert merged.n_sources == 97 + 89
