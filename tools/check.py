#!/usr/bin/env python3
"""Dev oracle compare: for each dumped query in OUTDIR, run its oracle SQL
in DuckDB over the sf parquet tables and diff (row count, sorted-column
value hash) — a local replica of the driver's correctness gate.

Usage: python3 tools/check.py [--rel] <sfDir> <outDir> [query ...]

--rel switches FLOAT comparison to relative tolerance (1e-9) instead of
absolute 6dp rounding. Use ONLY for large-SF scale-step spot checks:
a double sum at 1e10 magnitude legitimately differs between engines at
the 14th significant digit (summation order), which absolute rounding
flags as FAIL. The default (absolute) stays the faithful replica of
the driver's gate.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    # round floats before comparing: 1-ulp cross-engine drift must not
    # flag a false FAIL (the driver's gate rounds the same way)
    df = df.copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    cols = sorted(df.columns)
    return df[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)

def values_match(s, o, rel):
    if not rel:
        return bool(((s.eq(o)) | (s.isna() & o.isna())).all().all())
    import numpy as np
    for c in s.columns:
        a, b = s[c], o[c]
        if a.dtype.kind == "f":
            ok = np.isclose(a, b, rtol=1e-9, atol=1e-6, equal_nan=True)
        else:
            ok = (a.eq(b)) | (a.isna() & b.isna())
        if not bool(np.all(ok)):
            return False
    return True

def main():
    args = sys.argv[1:]
    rel = "--rel" in args
    if rel:
        args.remove("--rel")
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table (e.g. a ScaleUp step)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"{name:24s} NO SPARK OUTPUT"); n_fail += 1; continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").df()
            ora_df = con.execute(oracle[name]).df()
        except Exception as ex:
            print(f"{name:24s} ORACLE ERROR: {ex}"); n_fail += 1; continue
        s, o = norm(spark_df), norm(ora_df)
        rows_ok = len(s) == len(o)
        # compare dtype KINDS too: dtype-blind eq() would accept 3.0 == 3
        # when a query loses a .cast("long"), type drift the old
        # astype(str) compare caught (kinds, not widths — int32 vs int64
        # is engine noise, int vs float is a contract break)
        kinds_ok = [d.kind for d in s.dtypes] == [d.kind for d in o.dtypes]
        schema_ok = list(s.columns) == list(o.columns) and kinds_ok
        val_ok = False
        if rows_ok and schema_ok:
            try:
                # null-aware compare: None vs NaN/NaT and -0.0 vs 0.0
                # stringify differently — eq() + isna() masking avoids
                # spurious FAILs the astype(str) form produced
                val_ok = values_match(s, o, rel)
            except Exception:
                val_ok = False
        ok = rows_ok and schema_ok and val_ok
        if ok:
            n_pass += 1
            print(f"{name:24s} PASS  rows={len(s)}")
        else:
            n_fail += 1
            print(f"{name:24s} FAIL  rows {len(s)} vs {len(o)} "
                  f"schema_ok={schema_ok} cols {list(s.columns)} vs {list(o.columns)} "
                  f"kinds {[d.kind for d in s.dtypes]} vs {[d.kind for d in o.dtypes]}")
            if rows_ok and schema_ok:
                diff = (~(s.eq(o) | (s.isna() & o.isna()))).any(axis=1)
                idx = diff[diff].index[:5]
                for i in idx:
                    print(f"   spark : {s.loc[i].to_dict()}")
                    print(f"   oracle: {o.loc[i].to_dict()}")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
