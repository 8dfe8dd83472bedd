#!/bin/bash
# Launch graft.ScaleGate with the build.sbt JVM options but WITHOUT sbt,
# so long gate runs don't hold the sbt build lock. Usage:
#   scripts/gate.sh <heap> <baseDir> <factor> [query ... | --fullstar]
# e.g. scripts/gate.sh 90g /root/testdata/sf0.1 100 q_token_count ...
set -euo pipefail
HEAP="$1"; shift
# Repo root from the script's own location (ADVICE r13: a hardcoded
# /root/repo classpath silently ran stale classes from the wrong
# checkout), and fail fast if the classes dir is older than the newest
# source file — a gate over stale classes measures the wrong engine.
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
CLASSES="$ROOT/target/scala-2.13/classes"
[ -d "$CLASSES" ] || { echo "gate.sh: $CLASSES missing — run 'sbt compile'" >&2; exit 1; }
NEWEST_CLASS=$(find "$CLASSES" -name '*.class' -printf '%T@\n' | sort -rn | head -1)
NEWEST_SRC=$(find "$ROOT/src/main" -name '*.scala' -printf '%T@ %p\n' | sort -rn | head -1)
if [ -n "$NEWEST_SRC" ] && \
   awk -v s="${NEWEST_SRC%% *}" -v c="${NEWEST_CLASS:-0}" 'BEGIN{exit !(s>c)}'; then
  echo "gate.sh: STALE classes — ${NEWEST_SRC#* } is newer than every .class; run 'sbt compile' first" >&2
  exit 1
fi
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent \
         java.base/java.util.concurrent.atomic java.base/sun.nio.ch \
         java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"$HEAP" -cp "$CLASSES:/opt/spark/jars/*" \
  graft.ScaleGate "$@"
