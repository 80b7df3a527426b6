#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage:  python3 tools/check.py [sfDir] [outDir]

Reads each SparkEntry result parquet written by `graft.Verify` from outDir,
runs the corresponding oracle SQL in DuckDB against the same sfDir tables,
and compares BOTH:
  1. arrow schema dtypes (the driver's hash is dtype-sensitive: DuckDB
     sum(BIGINT) returns HUGEINT/int128 which hash-mismatches Spark's int64
     even when values are identical — pandas coercion masks this, arrow
     schemas catch it), and
  2. cell values (sorted columns by name + rows by all values).
Exits nonzero on any FAIL / CLOSE / DTYPE / EMPTY so scripted use catches
regressions before the driver runs.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

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

def norm_type(t: pa.DataType) -> str:
    """Normalize benign arrow-type variants; keep width/precision differences
    (int64 vs decimal128 is exactly the driver-visible hash bug)."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        # driver-verified equivalent (round-1 q18: spark timestamp vs duck
        # date hashed equal — pandas coerces both to datetime64)
        return "datetime"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{norm_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{norm_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    return str(t)

def schema_map(tb: pa.Table) -> dict:
    return {f.name: norm_type(f.type) for f in tb.schema}

n_exact = n_close = n_bad = n_dtype = 0
for name in sorted(oracles):
    res_dir = f"{OUT}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL  {name}: no spark result parquet"); n_bad += 1; continue
    try:
        spark_tb = pa.concat_tables([pq.read_table(f) for f in files])
        duck_tb = con.execute(oracles[name]).arrow()
        spark_df = canon(spark_tb.to_pandas())
        duck_df = canon(duck_tb.to_pandas())
    except Exception as e:
        print(f"FAIL  {name}: {e}"); n_bad += 1; continue
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL  {name}: cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        n_bad += 1; continue
    # dtype gate: the driver hashes dtype-sensitively — mismatched arrow types
    # (e.g. HUGEINT/decimal128 vs int64) fail the driver even with equal values
    s_types, d_types = schema_map(spark_tb), schema_map(duck_tb)
    bad_types = [c for c in sorted(s_types) if s_types[c] != d_types.get(c)]
    if bad_types:
        for c in bad_types:
            print(f"DTYPE {name}: col={c} spark={s_types[c]} duck={d_types.get(c)} — hash WILL MISMATCH")
        n_dtype += 1
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
    if exact and not bad_types:
        print(f"OK    {name}: exact ({len(spark_df)} rows)"); n_exact += 1
    elif exact and bad_types:
        pass  # already reported DTYPE above
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

# rows-only queries (no oracle): check non-empty; EMPTY counts as failure
n_empty = 0
for res_dir in sorted(glob.glob(f"{OUT}/*/")):
    name = os.path.basename(res_dir.rstrip("/"))
    if name in oracles: continue
    files = glob.glob(f"{res_dir}/*.parquet")
    n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
    if n == 0: n_empty += 1
    print(f"{'ROWS ' if n>0 else 'EMPTY'} {name}: {n} rows (no oracle)")

print(f"\n{n_exact} exact, {n_close} close, {n_dtype} dtype, {n_bad} fail, {n_empty} empty")
sys.exit(1 if (n_bad or n_close or n_dtype or n_empty) else 0)
