#!/bin/bash
# Direct-JVM runner for graft mains (Bench / Verify / ProfileQuery /
# ExplainDump): same JVM options as build.sbt's forked run, without the
# ~90 s sbt startup per invocation. Usage:
#   tools/run_graft.sh graft.Bench [args...]
# Env contract identical to the sbt path (SPARK_GRAFT_*). Requires a
# prior `sbt -batch compile` (classes under target/scala-2.13/classes).
set -euo pipefail
cd "$(dirname "$0")/.."
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-48g}" -XX:ReservedCodeCacheSize=512m \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  ${SPARK_GRAFT_JAVA_OPTS:-} \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
