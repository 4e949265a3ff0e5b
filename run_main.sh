#!/bin/bash
# Run a graft main directly off the compiled classes (no sbt lock).
MAIN=$1; shift
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
SCALA_LIB=$(ls ~/.cache/coursier/v1/https/*/org/scala-lang/scala-library/2.13.17/scala-library-2.13.17.jar 2>/dev/null | head -1)
exec java $ADDOPENS -Xmx${SPARK_DRIVER_MEM:-32g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*${SCALA_LIB:+:$SCALA_LIB}" \
  "$MAIN" "$@"
