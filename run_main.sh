#!/bin/bash
# Run a graft main directly off the compiled classes (no sbt lock).
# Usage: run_main.sh <fully.qualified.MainClass> [args...]
if [ -z "$1" ]; then
  echo "usage: $0 <main-class> [args...]" >&2
  exit 2
fi
MAIN=$1; shift
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
# Any 2.13.x scala-library from the coursier cache (newest patch wins).
# The old single-star glob never matched the cache's real layout
# (https/<host>/<repo-dirs...>/org/...), and the ${SCALA_LIB:+} guard
# hid that silently — /opt/spark/jars's own scala-library carried the
# classpath. find is depth-agnostic, so a repo-path or patch bump
# can't silently drop the jar again; /opt/spark/jars remains the
# fallback either way.
SCALA_LIB=$(find ~/.cache/coursier -name 'scala-library-2.13.*.jar' 2>/dev/null | sort -V | tail -1)
if [ -z "$SCALA_LIB" ]; then
  echo "warning: no scala-library 2.13.x jar found in the coursier cache; relying on /opt/spark/jars" >&2
fi
exec java $ADDOPENS -Xmx${SPARK_DRIVER_MEM:-32g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$REPO_ROOT/target/scala-2.13/classes:/opt/spark/jars/*${SCALA_LIB:+:$SCALA_LIB}" \
  "$MAIN" "$@"
