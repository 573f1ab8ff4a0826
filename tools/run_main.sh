#!/bin/bash
# Run a graft main directly from compiled classes (no sbt — lets several
# long-running Verify/Bench jobs run concurrently without fighting over
# the sbt build lock). Mirrors build.sbt's forked-run javaOptions.
#   tools/run_main.sh <mainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g), SPARK_GRAFT_* pass through.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
# GRAFT_CLASSES: optional snapshot of the classes dir, so a long background
# job isn't affected by recompiles landing under it mid-run.
CP="${GRAFT_CLASSES:-$REPO/target/scala-2.13/classes}:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dlog4j2.configurationFile="$REPO/conf/log4j2.properties" \
  -cp "$CP" "$@"
