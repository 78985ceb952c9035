#!/bin/bash
# r11 verdict ask #5: interleaved A/B of the bucketed balances fold in
# its CLAIMED winning regime — one materialized clustering, N aligned
# consumers — vs the in-flight fold paying the exchange N times.
# Fresh JVM per leg, alternating, min-fold per mode.
# Usage: tools/ab_bucketed_regime.sh [RUNS=3] [CONSUMERS=2] [SF_DIR]
set -u
RUNS="${1:-3}"
CONSUMERS="${2:-2}"
SF="${3:-/tmp/scale100}"
for i in $(seq 1 "$RUNS"); do
  for mode in inflight bucketed; do
    SPARK_GRAFT_SF_DIR="$SF" PROBE_MODE="$mode" \
    PROBE_CONSUMERS="$CONSUMERS" SPARK_DRIVER_MEM=24g \
      tools/run_graft.sh graft.ProbeBucketedFold 2>/dev/null \
      | grep '"metric":"bucketed_regime"'
  done
done
