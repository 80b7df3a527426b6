#!/usr/bin/env bash
# Round-10 probe: measure the iterative graph kernels' DISTRIBUTED path at
# sf1 (the 10x disjoint-universe replica ScaleProbe generates), next to the
# size-gated single-task fold the bench normally measures — VERDICT round-9
# item 2: "the bench no longer exercises the distributed iterative kernels".
#
# Runs the heavy iterative set twice on the same data, same session config:
#   1. default gate (4M edges): every sf1 graph still folds in one task;
#   2. SPARK_GRAFT_LOCAL_FOLD_MAX_EDGES=-1: the distributed rounds
#      (pointer-jumping labels, frontier BFS, pageRank loop) forced on.
# Writes bench/iter_distributed_sf1.json with both series.
#
# Usage: tools/iter_probe.sh [probeDir]   (generates probeDir if missing)
set -euo pipefail
cd "$(dirname "$0")/.."
PROBE="${1:-/tmp/sf1probe}"
QUERIES="d08_dedup_clusters,s11_semantic_clusters,d19_crosslingual_mirrors,q48_pagerank_authority,q55_bfs_levels,d12_dedup_keep_best,t26_cluster_split,d16_dedup_savings,t46_license_cluster"

if [ ! -d "$PROBE" ]; then
  echo "[iter_probe] generating 10x replica at $PROBE" >&2
  sbt -batch -error "runMain graft.ScaleProbe $PROBE" 1>&2
fi

run() { # $1 = gate env value or empty
  if [ -n "${1:-}" ]; then
    SPARK_GRAFT_LOCAL_FOLD_MAX_EDGES="$1" SPARK_GRAFT_SF_DIR="$PROBE" \
      SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$QUERIES" tools/bench.sh 2>/dev/null | tail -1
  else
    SPARK_GRAFT_SF_DIR="$PROBE" \
      SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$QUERIES" tools/bench.sh 2>/dev/null | tail -1
  fi
}

echo "[iter_probe] folded (default gate) run" >&2
FOLDED=$(run "")
echo "[iter_probe] forced-distributed run" >&2
DIST=$(run "-1")

python3 - "$FOLDED" "$DIST" <<'EOF'
import json, sys
folded = json.loads(sys.argv[1]); dist = json.loads(sys.argv[2])
out = {
  "note": ("Round-10 probe of VERDICT item 2: the same heavy iterative set on the "
           "ScaleProbe 10x replica of sf0.1, default size gate (single-task fold) vs "
           "SPARK_GRAFT_LOCAL_FOLD_MAX_EDGES=-1 (distributed pointer-jumping/frontier/"
           "pagerank rounds forced). Same host, back to back, warmup + min-of-2 each."),
  "generator": "tools/iter_probe.sh (sbt 'runMain graft.ScaleProbe <dir>')",
  "sf": folded.get("sf"),
  "control_sec_folded": folded.get("control_sec"),
  "control_sec_distributed": dist.get("control_sec"),
  "queries_folded_sec": folded.get("queries"),
  "queries_distributed_sec": dist.get("queries"),
  "fold_over_distributed": {
    q: round(dist["queries"][q] / folded["queries"][q], 3)
    for q in folded.get("queries", {}) if q in dist.get("queries", {})
  },
}
with open("bench/iter_distributed_sf1.json", "w") as f:
  json.dump(out, f, indent=1)
print(json.dumps(out["fold_over_distributed"], indent=1))
EOF
echo "[iter_probe] wrote bench/iter_distributed_sf1.json" >&2
