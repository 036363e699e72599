#!/bin/bash
# Fast runner: java against compiled classes + Spark jars (skips sbt startup).
# Usage: tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_out
CLS="$1"; shift
# Default heap = half of physical RAM clamped to [8g, 48g] (same rule as
# build.sbt); SPARK_DRIVER_MEM overrides — see BASELINE.md.
if [ -z "$SPARK_DRIVER_MEM" ]; then
  mem_kb=$(awk '/^MemTotal:/{print $2}' /proc/meminfo 2>/dev/null)
  half_gb=$(( ${mem_kb:-16777216} / 2097152 ))
  [ "$half_gb" -lt 8 ] && half_gb=8
  [ "$half_gb" -gt 48 ] && half_gb=48
  SPARK_DRIVER_MEM="${half_gb}g"
fi
exec java \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM} \
  -cp "/root/repo/target/scala-2.13/classes:/root/repo/target/scala-2.13/test-classes:/opt/spark/jars/*" \
  "$CLS" "$@"
