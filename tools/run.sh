#!/bin/bash
# Launch a graft main class directly against the compiled classes +
# Spark's unmanaged jars, bypassing the sbt project lock so long-running
# probes can share the machine with foreground sbt work.
# Usage: tools/run.sh <mainClass> [args...]   (run `sbt compile` first)
set -euo pipefail
cd "$(dirname "$0")/.."
# the standalone executor launcher (local-cluster mode) resolves the
# Scala dir without sourcing load-spark-env.sh — pin it
export SPARK_SCALA_VERSION="${SPARK_SCALA_VERSION:-2.13}"
OPENS="--add-modules=jdk.incubator.vector"
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
OPENS="$OPENS --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
# ABSOLUTE classes path: local-cluster executors inherit this classpath
# string but run in their own work dir — a relative path resolves to
# nothing there and lambda-shipping queries fail with SerializedLambda
# ClassCastExceptions (measured, not hypothetical)
CLASSES="${GRAFT_CLASSES:-$PWD/target/scala-2.13/classes}"
case "$CLASSES" in /*) ;; *) CLASSES="$PWD/$CLASSES" ;; esac
exec java $OPENS -Xmx${GRAFT_XMX:-100g} \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
