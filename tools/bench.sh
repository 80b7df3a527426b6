#!/usr/bin/env bash
# Runs graft.Bench via `java -cp` directly — no sbt wrapper — so the compact
# JSON line that Bench prints last is literally the LAST line of stdout (the
# driver's tail capture parses the final line as JSON; sbt's logger prefixes
# and "[success] Total time ..." trailer broke that for four rounds).
#
# Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/bench.sh
# The compile step (if needed) logs to stderr only.
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch -error compile 1>&2

ADD_OPENS=(
  java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect
  java.base/java.io java.base/java.net java.base/java.nio java.base/java.util
  java.base/java.util.concurrent java.base/java.util.concurrent.atomic
  java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar
)
OPTS=()
for p in "${ADD_OPENS[@]}"; do OPTS+=(--add-opens "$p=ALL-UNNAMED"); done

exec java "${OPTS[@]}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench "$@"
