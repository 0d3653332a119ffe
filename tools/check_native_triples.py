"""Dev harness: verify native_triples / native_entities against the
DuckDB oracle SQL (the same comparison the driver runs), at sf0.001.

Usage: python tools/check_native_triples.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def compare(name: str, spark_df, oracle_df: pd.DataFrame) -> bool:
    sp = spark_df.toPandas()
    cols = sorted(sp.columns)
    assert sorted(oracle_df.columns) == cols, (sorted(oracle_df.columns), cols)
    a = sp[cols].sort_values(cols).reset_index(drop=True)
    b = oracle_df[cols].sort_values(cols).reset_index(drop=True)
    ok = len(a) == len(b) and a.astype(str).equals(b.astype(str))
    print(f"{name}: spark={len(a)} oracle={len(b)} match={ok}")
    if not ok and len(a) == len(b):
        neq = (a.astype(str) != b.astype(str)).any(axis=1)
        print(pd.concat([a[neq].head(5), b[neq].head(5)], axis=1))
    elif not ok:
        sa = set(map(tuple, a.astype(str).values))
        sb = set(map(tuple, b.astype(str).values))
        print("only spark:", list(sa - sb)[:5])
        print("only oracle:", list(sb - sa)[:5])
    return ok


def main():
    sf = "/root/testdata/sf0.001"
    from coap_rfc_knowledge_graph_spark.session import build_session

    import __spark_entry__ as entry

    spark = build_session(cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    sqls = entry.oracle_sql()
    qs = entry.queries()
    ok = True
    for name in ("kg_triples_native", "kg_entities_native"):
        spark_df = qs[name](spark, sf)
        oracle_df = con.execute(sqls[name]).fetchdf()
        ok = compare(name, spark_df, oracle_df) and ok
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
