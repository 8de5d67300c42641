#!/bin/bash
# Run a graft main class directly on the compiled classes + the Spark
# jars, WITHOUT taking the sbt project lock. Use for background
# measurements (VmCalibration probes, Bench, Verify) while sbt is busy
# — and never compile while a measurement runs (a mid-run recompile
# once corrupted one; see BENCH/BASELINE.md §5).
#
#   scripts/runjava.sh graft.VmCalibration
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 scripts/runjava.sh graft.Bench
#
# The --add-opens list mirrors build.sbt's fork options (JDK 17).
cd "$(dirname "$0")/.." || exit 1
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
exec java $ADDOPENS -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -Xmx8g -XX:+UseParallelGC -cp "$CP" "$@"
