#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare.

Usage: python3 scripts/oracle_compare.py <sfDir> <verifyOutDir> [query ...]

For each query: load the Spark result parquet (written by graft.Verify),
run the oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
<sfDir> tables, sort columns by name and rows by all columns, and compare
cell-by-cell (floats exact — the suite is engineered for bit parity).
Prints one line per query and a final PASS/FAIL summary.
"""
import sys, json, math
import duckdb
import pandas as pd

TABLES = ["lineitem", "orders", "customer", "nation", "region", "part",
          "supplier", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> list:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for tup in df.itertuples(index=False, name=None):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("NULL")
            elif isinstance(v, float):
                row.append(repr(v))
            elif isinstance(v, bool):
                row.append(str(bool(v)))
            else:
                row.append(str(v))
        rows.append("\x01".join(row))
    return sorted(rows)

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            spark = pd.read_parquet(f"{out}/{name}")
        except Exception as e:
            print(f"[cmp] {name}: NO SPARK RESULT ({e})")
            n_bad += 1
            continue
        try:
            ora = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"[cmp] {name}: ORACLE ERR {e}")
            n_bad += 1
            continue
        sc = sorted(spark.columns)
        oc = sorted(ora.columns)
        if sc != [c.lower() for c in oc] and sc != oc:
            print(f"[cmp] {name}: SCHEMA MISMATCH spark={sc} oracle={oc}")
            n_bad += 1
            continue
        ora.columns = [c for c in ora.columns]
        a, b = canon(spark), canon(ora)
        if len(a) != len(b):
            print(f"[cmp] {name}: ROWS {len(a)} vs {len(b)}")
            n_bad += 1
        elif a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"[cmp] {name}: HASH MISMATCH e.g. {diffs}")
            n_bad += 1
        else:
            print(f"[cmp] {name}: ok ({len(a)} rows)")
    print(f"[cmp] {'FAIL' if n_bad else 'PASS'} bad={n_bad}")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
