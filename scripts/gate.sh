#!/bin/bash
# Launch graft.ScaleGate with the build.sbt JVM options but WITHOUT sbt,
# so long gate runs don't hold the sbt build lock. Usage:
#   scripts/gate.sh <heap> <baseDir> <factor> [query ... | --fullstar]
# e.g. scripts/gate.sh 90g /root/testdata/sf0.1 100 q_token_count ...
set -euo pipefail
HEAP="$1"; shift
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
  -Xmx"$HEAP" -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.ScaleGate "$@"
