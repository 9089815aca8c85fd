#!/usr/bin/env python3
"""Per-round targeted sf0.1 sweep runner.

Reads tools/sweep_manifest.txt (the committed sweep set: every query
>= 0.5 s at sf0.1 plus one per operator family), runs graft.Verify for
exactly those queries at the given scale factor, then compares each
against its DuckDB oracle (reusing check_oracle.compare_one). Entries
marked `spark-only` skip the oracle replay — those oracles are
pathological at sf0.1 (unrolled Lloyd / recursive CTE), and their
correctness stays gated at sf0.01 by the driver — but the engine side
still runs and records rows + wall time.

Usage: python3 tools/sweep.py [sf_dir] [manifest] [out_json]
Defaults: /root/testdata/sf0.1, tools/sweep_manifest.txt, SWEEP_sf0.1.json

Writes the JSON summary and prints a one-paragraph markdown block to
paste into COVERAGE.md's scale-robustness section.
"""
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_oracle  # noqa: E402


def parse_manifest(path):
    full, spark_only = [], []
    for raw in open(path):
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        parts = line.split()
        (spark_only if "spark-only" in parts[1:] else full).append(parts[0])
    return full, spark_only


def main(sf_dir, manifest, out_json):
    full, spark_only = parse_manifest(manifest)
    names = full + spark_only
    out_dir = tempfile.mkdtemp(prefix="graft_sweep_")
    t0 = time.time()
    subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.Verify {sf_dir} {out_dir} {','.join(names)}"],
        check=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    spark_secs = round(time.time() - t0, 1)

    con = check_oracle.connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    n_pass = n_fail = 0
    t1 = time.time()
    for name in full:
        if name not in oracle:
            status, rows, detail = "NOORACLE", 0, "manifest entry has no oracle SQL"
        else:
            status, rows, detail = check_oracle.compare_one(con, out_dir, name, oracle[name])
        results[name] = {"status": status, "rows": rows}
        if status == "PASS":
            n_pass += 1
            print(f"PASS     {name} ({rows} rows)")
        else:
            n_fail += 1
            print(f"{status:8s} {name}: {detail}")
    for name in spark_only:
        try:
            rows = con.sql(f"SELECT COUNT(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
            results[name] = {"status": "SPARK-ONLY", "rows": rows}
            print(f"SPARKONLY {name} ({rows} rows, oracle skipped by manifest)")
            if rows <= 0:
                n_fail += 1
        except Exception as e:
            results[name] = {"status": "MISSING", "rows": 0}
            print(f"MISSING  {name}: {e}")
            n_fail += 1
    oracle_secs = round(time.time() - t1, 1)

    # oracle TYPE-parity pre-flight (the HUGEINT render-mismatch class,
    # tools/audit_oracle_types.py): value-compare alone cannot see a
    # float64-rendered oracle column, so a bare integer SUM anywhere in
    # the swept oracles fails the sweep here — no whitelist.
    import audit_oracle_types
    print("\n-- oracle type audit --")
    type_errors = audit_oracle_types.main(out_dir, sf_dir)
    if type_errors:
        n_fail += 1

    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(names),
        "n_pass": n_pass,
        "n_spark_only": len(spark_only),
        "n_fail": n_fail,
        "spark_secs": spark_secs,
        "oracle_secs": oracle_secs,
        "type_audit": "FAIL" if type_errors else "PASS",
        "results": results,
    }
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"\n{n_pass}/{len(full)} oracle-green, {len(spark_only)} spark-only, "
          f"{n_fail} failures; spark {spark_secs}s, oracle {oracle_secs}s -> {out_json}")
    print("\nCOVERAGE.md line:")
    print(f"a {len(names)}-query sf0.1 sweep (tools/sweep_manifest.txt via tools/sweep.py): "
          f"{n_pass}/{len(full)} oracle-green at 10x the gate, "
          f"{len(spark_only)} oracle-pathological queries run spark-side "
          f"(rows recorded), {n_fail} failures.")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mf = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "sweep_manifest.txt")
    oj = sys.argv[3] if len(sys.argv) > 3 else "SWEEP_sf0.1.json"
    sys.exit(main(sf, mf, oj))
