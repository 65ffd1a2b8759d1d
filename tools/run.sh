#!/usr/bin/env bash
# Dev launcher for graft mains without sbt (avoids the sbt lock so
# long-running GenScale/Bench/Verify legs can overlap a test build).
# Usage: tools/run.sh <MainClass> [args...]   (e.g. graft.GenScale)
# Env: SPARK_DRIVER_MEM (default 8g), SPARK_GRAFT_* knobs pass through.
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -cp "$CP" $OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Duser.language=en -Duser.country=US \
  "$@"
