#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (graft.Verify output), runs the
matching SQL from oracle_sql.json in DuckDB with the testdata tables
registered as views, and compares: column names (sorted), row count, and
values (rows sorted by all columns, exact equality — matching the
driver's hash compare as closely as we can)."""
import json, sys, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify to mimic a hash over rendered values; sort rows for set compare
    s = df.astype(str)
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    return s

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        if only and name not in only:
            continue
        if name not in oracle:
            n_skip += 1
            print(f"SKIP  {name} (no oracle; rows-only)")
            continue
        try:
            got = pd.read_parquet(path)
            want = con.execute(oracle[name]).fetchdf()
            cg, cw = canon(got), canon(want)
            if list(cg.columns) != list(cw.columns):
                n_fail += 1
                print(f"FAIL  {name}: columns {list(cg.columns)} vs {list(cw.columns)}")
            elif len(cg) != len(cw):
                n_fail += 1
                print(f"FAIL  {name}: rows {len(cg)} vs {len(cw)}")
            elif not cg.equals(cw):
                n_fail += 1
                diff = (cg != cw).any(axis=1)
                idx = diff[diff].index[:3]
                print(f"FAIL  {name}: value mismatch, e.g.")
                for i in idx:
                    print(f"   spark: {cg.loc[i].to_dict()}")
                    print(f"   duck : {cw.loc[i].to_dict()}")
            else:
                n_pass += 1
                # informational: would it also match under an ORDER-
                # SENSITIVE hash? (both sides carry total ORDER BYs)
                gu = got.reindex(sorted(got.columns), axis=1).astype(str)
                wu = want.reindex(sorted(want.columns), axis=1).astype(str)
                tag = "" if gu.reset_index(drop=True).equals(wu.reset_index(drop=True)) else "  [row-order differs]"
                print(f"PASS  {name} ({len(cg)} rows){tag}")
        except Exception as e:
            n_fail += 1
            print(f"FAIL  {name}: {type(e).__name__}: {e}")
    print(f"== {n_pass} pass / {n_fail} fail / {n_skip} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
