#!/bin/bash
# Run a graft main class against the compiled classes + Spark jars,
# mirroring build.sbt's forked-JVM options (JDK17 add-opens, UTC, no UI).
# Usage: tools/run.sh graft.Bench [args...]   (env vars pass through)
set -euo pipefail
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens $p=ALL-UNNAMED"
done
# SPARK_GRAFT_JAVA_OPTS: extra -D flags (e.g. -Dspark.graft.streaming.stateStore=rocksdb
# to A/B state-store providers — SparkConf picks up spark.* system properties)
exec java $ADD_OPENS ${SPARK_GRAFT_JAVA_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" -cp "$CP" "$@"
