#!/usr/bin/env python3
"""Column-type parity audit between each query's Spark parquet dump and
its DuckDB oracle result.

Why this exists: the local gate (check_oracle.py) compares VALUES with
``assert_frame_equal(check_dtype=False)``, so an oracle column that
DuckDB types as HUGEINT (any integer SUM) round-trips through pandas as
float64 and still compares equal to Spark's int64 — locally green. A
comparator that hashes rendered values instead (``59184.0`` vs
``59184``) flags the same query red. Rounds 7-9 chased exactly this as
a math bug; it was a type bug in the oracle SQL.

The contract this audit enforces: for every query, the pandas dtype of
each oracle column must EXACTLY match the dtype of the Spark parquet
column. int32-vs-int64 is reported as INFO (same rendered text); any
int-vs-float / float-vs-object / bool-vs-int mismatch is an ERROR.

Usage: python3 tools/audit_oracle_types.py <verify_out_dir> <sf_dir>
Exit 1 iff any ERROR.
"""
import glob
import json
import sys

import check_oracle


# r10's diag_channel_hugeint control was retired in r11 (its oracle is
# now BIGINT-cast like every other integer SUM), so NOTHING is
# whitelisted: any render-mismatch typing is an ERROR.
CONTROLS: set = set()


INT_T = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
         "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT"}


def kind(t) -> str:
    s = str(t).upper()
    if s in INT_T:
        return "int"
    if s in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    return s


def main(out_dir: str, sf_dir: str) -> int:
    con = check_oracle.connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_err = n_info = 0
    for name in sorted(oracle):
        if not glob.glob(f"{out_dir}/{name}/*.parquet"):
            continue
        spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        spark_t = dict(zip(spark_rel.columns, [str(t) for t in spark_rel.types]))
        try:
            rel = con.sql(oracle[name])
            ora_t = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:
            print(f"ORAFAIL  {name}: {str(e)[:160]}")
            n_err += 1
            continue
        for c in sorted(set(spark_t) & set(ora_t)):
            g, e = spark_t[c], ora_t[c]
            if g == e:
                continue
            # HUGEINT/DECIMAL render float64/Decimal through pandas while
            # the Spark side stays int64 — the render-mismatch class
            bad = e in ("HUGEINT", "UHUGEINT") or e.startswith("DECIMAL") \
                or kind(g) != kind(e)
            if not bad:
                print(f"INFO     {name}.{c}: spark={g} oracle={e} (same render)")
                n_info += 1
            elif name in CONTROLS:
                print(f"CONTROL  {name}.{c}: spark={g} oracle={e} (intentional)")
            else:
                print(f"ERROR    {name}.{c}: spark={g} oracle={e}")
                n_err += 1
    print(f"\n{n_err} errors, {n_info} width-only infos over {len(oracle)} oracles")
    return 1 if n_err else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
