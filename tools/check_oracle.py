#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet dir written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf parquet tables, and
compares: columns sorted by name, rows sorted, values compared exactly
(floats bitwise after float64 cast).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not res_glob:
            print(f"MISSING  {name}: no parquet output")
            n_fail += 1
            continue
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"ORAFAIL  {name}: {e}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"COLS     {name}: got {list(g.columns)} vs oracle {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"ROWS     {name}: got {len(g)} vs oracle {len(e)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"PASS     {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError as ex:
            print(f"VALUES   {name}: {str(ex).splitlines()[-1][:300]}")
            # show first differing row for debugging
            neq = (g != e) & ~(g.isna() & e.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print(f"         first diff row {i}:\n  got: {g.loc[i].to_dict()}\n  exp: {e.loc[i].to_dict()}")
            n_fail += 1
    extra = [q for q in os.listdir(out_dir)
             if os.path.isdir(f"{out_dir}/{q}") and q not in oracle]
    for q in sorted(extra):
        n = con.sql(f"SELECT COUNT(*) FROM '{out_dir}/{q}/*.parquet'").fetchone()[0]
        print(f"NOORACLE {q} ({n} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(extra)} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
