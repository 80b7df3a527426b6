#!/bin/bash
# Per-query wrapper around check.py with a timeout, so the deliberately
# quadratic oracle anchors (hours in DuckDB at sf0.1) can't stall a
# large-scale verification pass: each timed-out oracle is recorded as
# SKIPPED-TIMEOUT instead of blocking the rest of the suite.
# Usage: tools/check_each.sh <sfDir> <verifyOut> <timeoutSec> [logFile]
set -u
SF="$1"; OUT="$2"; TMO="${3:-300}"; LOG="${4:-/dev/stdout}"
WORK=$(mktemp -d)
for name in $(python3 -c "import json; print('\n'.join(sorted(json.load(open('$OUT/oracle_sql.json')))))"); do
  T="$WORK/$name"; mkdir -p "$T"
  ln -sfn "$OUT/$name" "$T/$name"
  python3 -c "import json; d=json.load(open('$OUT/oracle_sql.json')); json.dump({'$name': d['$name']}, open('$T/oracle_sql.json','w'))"
  timeout "$TMO" python3 tools/check.py "$SF" "$T" >> "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 124 ]; then echo "SKIPPED-TIMEOUT $name (oracle exceeded ${TMO}s)" >> "$LOG"; fi
done
rm -rf "$WORK"
