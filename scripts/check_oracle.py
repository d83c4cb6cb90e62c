#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, normalize (columns sorted by name,
rows sorted, doubles rounded to 6dp), and diff against the Spark output
parquet written by graft.Verify.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == "float64" or df[c].dtype == "float32":
            df[c] = df[c].astype(float).round(6).map(
                lambda x: 0.0 if x == 0 else x)  # -0.0 -> 0.0
        # timestamps: normalize to ns-less string (tz-aware -> UTC naive)
        if "datetime" in str(df[c].dtype):
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]").astype(str)
        if df[c].dtype == object:
            df[c] = df[c].map(lambda x: str(x))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name in sorted(oracle):
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            continue
        e_n, g_n = normalize(exp), normalize(got)
        if list(e_n.columns) != list(g_n.columns):
            print(f"FAIL {name}: columns differ: oracle={list(e_n.columns)} spark={list(g_n.columns)}")
            continue
        if len(e_n) != len(g_n):
            print(f"FAIL {name}: rows differ: oracle={len(e_n)} spark={len(g_n)}")
            continue
        if e_n.equals(g_n):
            print(f"OK   {name} ({len(e_n)} rows)")
            n_ok += 1
        else:
            neq = (e_n != g_n).any(axis=1)
            bad = neq[neq].index[:3]
            print(f"FAIL {name}: {int(neq.sum())}/{len(e_n)} rows differ; first:")
            for i in bad:
                print(f"  oracle: {e_n.loc[i].to_dict()}")
                print(f"  spark : {g_n.loc[i].to_dict()}")
    print(f"== {n_ok}/{len(oracle)} OK ==")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
