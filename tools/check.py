#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the raw tables in
<sfDir>, and compares: schema (column names), row count, and a hash of all
values with columns sorted by name and rows sorted by all columns.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns, floats to 9dp strings for stable hashing
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == "float64" or df[c].dtype == "float32":
            df[c] = df[c].astype("float64").round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
            duck_df = con.sql(sql).df()
            a, b = canon(spark_df), canon(duck_df)
            if list(a.columns) != list(b.columns):
                print(f"FAIL {name}: columns {list(a.columns)} != {list(b.columns)}")
                n_fail += 1
            elif len(a) != len(b):
                print(f"FAIL {name}: rows {len(a)} != {len(b)}")
                n_fail += 1
            elif not a.equals(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                bad = neq.any(axis=1)
                print(f"FAIL {name}: values differ in {int(bad.sum())}/{len(a)} rows")
                print("  spark:", a[bad].head(3).to_dict("records"))
                print("  duck :", b[bad].head(3).to_dict("records"))
                n_fail += 1
            else:
                print(f"PASS {name} ({len(a)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
