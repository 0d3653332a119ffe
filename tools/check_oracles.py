"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at the
same sf dir, compare row count, column set, and an order-insensitive
value hash. Usage:  python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from coap_rfc_knowledge_graph_spark.session import build_session

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_hash(pdf: pd.DataFrame) -> str:
    import hashlib

    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    # stringify with stable float formatting; sort rows for order-insensitivity
    def cell(v):
        if isinstance(v, float):
            return f"{v:.6g}"
        return str(v)

    rows = sorted("\x1f".join(cell(v) for v in row) for row in pdf.itertuples(index=False, name=None))
    return hashlib.md5("\x1e".join(rows).encode("utf-8")).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_session(cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(spdf)} (rows-only check)")
            n_weak += 1
            continue
        try:
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        ok_rows = len(spdf) == len(opdf)
        ok_cols = sorted(spdf.columns) == sorted(opdf.columns)
        ok_hash = ok_rows and ok_cols and norm_hash(spdf) == norm_hash(opdf)
        if ok_hash:
            print(f"PASS  {name}: rows={len(spdf)}")
            n_pass += 1
        else:
            print(
                f"FAIL  {name}: rows {len(spdf)} vs {len(opdf)}; "
                f"cols {sorted(spdf.columns)} vs {sorted(opdf.columns)}; hash_eq={ok_hash}"
            )
            if ok_rows and ok_cols:
                merged = spdf.sort_values(sorted(spdf.columns)).head(3)
                om = opdf.sort_values(sorted(opdf.columns)).head(3)
                print("  spark:", merged.to_dict("records"))
                print("  duck :", om.to_dict("records"))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_weak} weak, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
