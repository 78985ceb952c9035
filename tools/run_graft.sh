#!/bin/bash
# Run a graft main against a CLASS SNAPSHOT (default /tmp/graft_classes),
# so long probes are immune to concurrent source edits/recompiles.
# Usage: tools/run_graft.sh graft.Bench [args...]
# Env: GRAFT_CLASSES (snapshot dir), SPARK_DRIVER_MEM (default 24g),
#      GRAFT_SPARK_OPTS (extra -Dspark.* properties, e.g.
#      -Dspark.driver.maxResultSize=8g for the MemoryStream replay
#      harnesses at 1000x, whose feed collect is driver-bounded by
#      design).
set -u
CLASSES="${GRAFT_CLASSES:-/tmp/graft_classes}"
MEM="${SPARK_DRIVER_MEM:-24g}"
EXTRA="${GRAFT_SPARK_OPTS:-}"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx"$MEM" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  $EXTRA \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
