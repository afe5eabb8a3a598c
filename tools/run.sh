#!/bin/bash
# Run a graft main class directly against compiled classes + Spark jars
# (much faster than sbt runMain). Usage: tools/run.sh graft.Verify args...
set -e
cd "$(dirname "$0")/.."
# sbt compile does not copy resources; without META-INF/services the
# zarr DataSourceRegister is invisible and every z* query fails with
# DATA_SOURCE_NOT_FOUND. Copy them in when missing.
if [ ! -e target/scala-2.13/classes/META-INF/services/org.apache.spark.sql.sources.DataSourceRegister ]; then
  mkdir -p target/scala-2.13/classes
  cp -r src/main/resources/. target/scala-2.13/classes/
fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$@"
