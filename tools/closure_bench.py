#!/usr/bin/env python3
"""Scaled-down timing oracle for the transitive-closure dedup family.

At sf0.1 the DuckDB oracles for these queries (recursive-CTE connected
components / all-pairs closures) exceed the 120 s bench timeout, so the
headline bench can only record "Spark wins by forfeit". This tool makes the
win measurable: it times BOTH engines at sf0.01 — the largest standard SF
where DuckDB completes — and writes the per-query ratios to
bench/closure_scaled.json (single minified line). Bench.scala embeds that
artifact verbatim as the "closure_family" field of its JSON output, so the
ratios land in the round's BENCH JSON.

Usage: python3 tools/closure_bench.py [sfDir]
Needs: a Verify dump at /tmp/verify_out (for oracle_sql.json), duckdb,
and sbt on PATH. Run from the repo root.
"""
import json, os, subprocess, sys, tempfile

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
NAMES = ["d03_dedup_minhash_lsh", "d08_dedup_clusters", "d11_dedup_incremental",
         "d12_dedup_keep_best", "d13_dedup_jaccard_prefixfilter",
         "d16_dedup_savings", "t26_cluster_split", "t38_ingest_packed",
         "d18_source_overlap",  # embeds PairSql => same sf0.1 timeout family
         "t46_license_cluster"]  # recursive-CTE closure + lattice fold

oracles = json.load(open("/tmp/verify_out/oracle_sql.json"))
with tempfile.TemporaryDirectory() as td:
    json.dump({n: oracles[n] for n in NAMES}, open(f"{td}/oracle_sql.json", "w"))
    duck = json.loads(subprocess.run(
        ["python3", "tools/duckbench.py", SF, td, "120"],
        check=True, capture_output=True, text=True).stdout)["queries"]

env = dict(os.environ, SPARK_GRAFT_ONLY=",".join(NAMES), SPARK_GRAFT_SF_DIR=SF)
out = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                     check=True, capture_output=True, text=True, env=env).stdout
line = next(l for l in out.splitlines() if '"metric"' in l)
spark = json.loads(line[line.index("{"):])["queries"]

report = {
    "note": "sf0.1 DuckDB oracles for these queries exceed the 120s timeout; "
            "both engines timed at sf0.01 (largest standard SF DuckDB "
            "completes). Regenerate: python3 tools/closure_bench.py",
    "sf": SF,
    "queries": {n: {"spark_sec": spark[n], "duckdb_sec": duck[n],
                    "spark_over_duckdb": round(spark[n] / duck[n], 3)
                    if isinstance(duck[n], float) else None}
                for n in NAMES}}
os.makedirs("bench", exist_ok=True)
with open("bench/closure_scaled.json", "w") as f:
    f.write(json.dumps(report, separators=(",", ":")) + "\n")
print(json.dumps(report["queries"], indent=1))
