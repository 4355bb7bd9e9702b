#!/usr/bin/env bash
# Run a graft main class directly (faster than sbt runMain) with the SAME
# JDK-17 --add-opens set build.sbt forks with. Without these, Spark-on-17
# fails lazily and confusingly — e.g. Kryo cannot reflect
# java.nio.HeapByteBuffer, so only the Encoders.kryo query
# (vocab_topk_sketch) dies while 180+ others pass.
# Usage: scripts/graft_java.sh [-XmxNg] graft.Verify <sfDir> <outDir> [q...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ADDOPENS=()
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
MEM="-Xmx8g"
if [[ "${1:-}" == -Xmx* ]]; then MEM="$1"; shift; fi
CP="$REPO/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
exec java "${ADDOPENS[@]}" "$MEM" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
