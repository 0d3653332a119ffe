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
