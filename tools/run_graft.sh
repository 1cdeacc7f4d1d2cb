#!/bin/bash
# Direct JVM launcher for graft mains (avoids sbt lock + startup):
# tools/run_graft.sh <MainClass> [args...]; heap via SPARK_DRIVER_MEM.
# Default heap matches build.sbt's run/Test fallback (8g) so the same
# main behaves identically via either launcher (ADVICE r15); scaled-dir
# (benchdata/sf10x*) sessions pass SPARK_DRIVER_MEM=48g explicitly and
# the bench artifact records heap_max_gb either way.
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
