#!/usr/bin/env bash
# Round-10 stretch probe (VERDICT item 10): core-scaling ratios that mean
# something. At sf0.1 every query is fixed-overhead-bound and 8 cores beat
# 32; this runs the heavy set on the ScaleProbe 10x replica at 8 vs 32
# cores, same host, back to back, and records seconds + ratios.
# Usage: tools/core_scaling_probe.sh [probeDir]
set -euo pipefail
cd "$(dirname "$0")/.."
PROBE="${1:-/tmp/sf1probe}"
QUERIES="t38_ingest_packed,d13_dedup_jaccard_prefixfilter,q69_market_basket,q60_profile_drift,q102_profile_drift_scalable,q92_mad_outliers,d08_dedup_clusters,s11_semantic_clusters,d19_crosslingual_mirrors,q48_pagerank_authority,s20_hybrid_rrf,s21_hybrid_rrf_indexed"

if [ ! -d "$PROBE" ]; then
  echo "[core_probe] generating 10x replica at $PROBE" >&2
  sbt -batch -error "runMain graft.ScaleProbe $PROBE" 1>&2
fi

echo "[core_probe] 32-core run" >&2
C32=$(SPARK_GRAFT_SF_DIR="$PROBE" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$QUERIES" tools/bench.sh 2>/dev/null | tail -1)
echo "[core_probe] 8-core run" >&2
C8=$(SPARK_GRAFT_SF_DIR="$PROBE" SPARK_GRAFT_CPUS=8 SPARK_GRAFT_ONLY="$QUERIES" tools/bench.sh 2>/dev/null | tail -1)

python3 - "$C32" "$C8" <<'EOF'
import json, sys
c32 = json.loads(sys.argv[1]); c8 = json.loads(sys.argv[2])
out = {
  "note": ("Round-10 core-scaling probe on the ScaleProbe 10x replica: heavy set at "
           "local[32] vs local[8] (shuffle partitions = core count, per the bench "
           "contract), warmup + min-of-2, same host back to back. ratio_8_over_32 > 1 "
           "means 32 cores win (parallel headroom exists at this size)."),
  "sf": c32.get("sf"),
  "control_sec_32": c32.get("control_sec"),
  "control_sec_8": c8.get("control_sec"),
  "queries_32c_sec": c32.get("queries"),
  "queries_8c_sec": c8.get("queries"),
  "ratio_8_over_32": {
    q: round(c8["queries"][q] / c32["queries"][q], 3)
    for q in c32.get("queries", {}) if q in c8.get("queries", {})
  },
}
with open("bench/core_scaling_sf1.json", "w") as f:
  json.dump(out, f, indent=1)
print(json.dumps(out["ratio_8_over_32"], indent=1))
EOF
echo "[core_probe] wrote bench/core_scaling_sf1.json" >&2
