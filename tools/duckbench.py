#!/usr/bin/env python3
"""Per-query DuckDB timing of the oracle workload — the local replica of the
judge's baseline pass. For each oracle in a Verify dump, runs the SQL in
DuckDB (all cores) three times and records the min, mirroring Bench.scala's
steady-state estimator. Quadratic anchors and recursive-closure oracles are
guarded by a per-query timeout.

Usage: python3 tools/duckbench.py [sfDir] [verifyOut] [timeoutSec]
Writes JSON to stdout: {"queries": {name: sec|"timeout"}, "sf": sfDir}
"""
import json, sys, time, multiprocessing as mp

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TMO = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0


def run_one(name, sql, q):
    import duckdb
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    times = []
    for _ in range(3):
        t0 = time.time()
        con.execute(sql).fetchall()
        times.append(time.time() - t0)
    q.put(min(times))


def main():
    oracles = json.load(open(f"{OUT}/oracle_sql.json"))
    results = {}
    for name in sorted(oracles):
        q = mp.Queue()
        p = mp.Process(target=run_one, args=(name, oracles[name], q))
        p.start()
        p.join(TMO)
        if p.is_alive():
            p.terminate(); p.join()
            results[name] = "timeout"
            print(f"[duckbench] {name}: timeout >{TMO}s", file=sys.stderr)
        else:
            try:
                results[name] = round(q.get_nowait(), 3)
            except Exception:
                results[name] = "error"
        print(f"[duckbench] {name}: {results[name]}", file=sys.stderr)
    print(json.dumps({"queries": results, "sf": SF}))


if __name__ == "__main__":
    main()
