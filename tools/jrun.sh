#!/bin/bash
# Run a graft main with plain java (no sbt lock): tools/jrun.sh graft.Bench [args...]
# Mirrors build.sbt's forked-JVM options (JDK17 add-opens, UTC, no UI).
set -u
# Derive the repo root from this script's own location (ADVICE r20: a
# hardcoded /root/repo classpath silently ran stale/missing classes from
# another checkout or after a clean) and fail fast when the classes dir
# is absent.
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
CLASSES="$ROOT/target/scala-2.13/classes"
if [ ! -d "$CLASSES" ]; then
  echo "jrun.sh: $CLASSES not found — run 'sbt compile' first" >&2
  exit 1
fi
CP="$CLASSES:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  ${JRUN_PROPS:-} -cp "$CP" "$@"
