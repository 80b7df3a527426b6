#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage:  python3 tools/check.py [sfDir] [outDir]

Reads each SparkEntry result parquet written by `graft.Verify` from outDir,
runs the corresponding oracle SQL in DuckDB against the same sfDir tables,
sorts columns by name + rows by all values, and compares cell-by-cell.
Reports exact-match / close-match (fp tolerance) / mismatch per query, so
oracle SQL can be pre-validated before the driver runs.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracles = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a stable sort across dtypes
    df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str)).reset_index(drop=True)
    return df

n_exact = n_close = n_bad = 0
for name in sorted(oracles):
    res_dir = f"{OUT}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL  {name}: no spark result parquet"); n_bad += 1; continue
    try:
        spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
        duck_df = canon(con.execute(oracles[name]).fetchdf())
    except Exception as e:
        print(f"FAIL  {name}: {e}"); n_bad += 1; continue
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL  {name}: cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        n_bad += 1; continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL  {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
        n_bad += 1; continue
    exact = True; close = True; worst = 0.0; badcol = ""
    for c in spark_df.columns:
        a, b = spark_df[c], duck_df[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            af, bf = a.astype(float).values, b.astype(float).values
            if not np.array_equal(af, bf, equal_nan=True):
                exact = False
                d = np.nanmax(np.abs(af - bf)) if len(af) else 0.0
                if d > worst: worst, badcol = d, c
                if not np.allclose(af, bf, rtol=1e-9, atol=1e-9, equal_nan=True):
                    close = False
        else:
            if not a.astype(str).equals(b.astype(str)):
                exact = False; close = False; badcol = c
    if exact:
        print(f"OK    {name}: exact ({len(spark_df)} rows)"); n_exact += 1
    elif close:
        print(f"CLOSE {name}: fp-tolerance only, worst={worst:.3e} col={badcol} — hash WILL MISMATCH")
        n_close += 1
    else:
        print(f"FAIL  {name}: values differ, col={badcol} worst={worst:.3e}")
        # show a small diff sample
        for c in spark_df.columns:
            if not spark_df[c].astype(str).equals(duck_df[c].astype(str)):
                merged = pd.DataFrame({"spark": spark_df[c], "duck": duck_df[c]})
                print(merged[merged.spark.astype(str) != merged.duck.astype(str)].head(5))
                break
        n_bad += 1

# rows-only queries (no oracle): check non-empty
for res_dir in sorted(glob.glob(f"{OUT}/*/")):
    name = os.path.basename(res_dir.rstrip("/"))
    if name in oracles: continue
    files = glob.glob(f"{res_dir}/*.parquet")
    n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
    print(f"{'ROWS ' if n>0 else 'EMPTY'} {name}: {n} rows (no oracle)")

print(f"\n{n_exact} exact, {n_close} close, {n_bad} fail")
sys.exit(1 if (n_bad or n_close) else 0)
