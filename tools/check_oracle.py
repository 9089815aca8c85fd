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


def connect(sf_dir: str):
    """DuckDB connection with a view per harness table."""
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def compare_one(con, out_dir: str, name: str, sql: str):
    """Compare one dumped query against its oracle SQL.

    Returns (status, n_rows, detail): status in PASS/MISSING/ORAFAIL/
    COLS/ROWS/VALUES — the same classes main() prints.
    """
    res_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not res_glob:
        return "MISSING", 0, "no parquet output"
    got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        return "ORAFAIL", len(got), str(e)
    g, e = norm(got), norm(exp)
    if list(g.columns) != list(e.columns):
        return "COLS", len(g), f"got {list(g.columns)} vs oracle {list(e.columns)}"
    if len(g) != len(e):
        return "ROWS", len(g), f"got {len(g)} vs oracle {len(e)}"
    try:
        pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
        return "PASS", len(g), ""
    except AssertionError as ex:
        detail = str(ex).splitlines()[-1][:300]
        neq = (g != e) & ~(g.isna() & e.isna())
        bad = neq.any(axis=1)
        if bad.any():
            i = bad.idxmax()
            detail += f"\n         first diff row {i}:\n  got: {g.loc[i].to_dict()}\n  exp: {e.loc[i].to_dict()}"
        return "VALUES", len(g), detail


def main(out_dir: str, sf_dir: str) -> int:
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        status, n_rows, detail = compare_one(con, out_dir, name, oracle[name])
        if status == "PASS":
            print(f"PASS     {name} ({n_rows} rows)")
            n_pass += 1
        else:
            print(f"{status:8s} {name}: {detail}")
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
