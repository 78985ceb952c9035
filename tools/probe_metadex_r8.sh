#!/bin/bash
# Round-8 metadex_settlement 1000x re-probe (the r6/r7 owed measurement).
# Protocol matches rounds 5-7 (24g driver, local[32], medians-of-3
# through 100x, single run at 1000x, gates first) with two r8 changes:
#  - runs against a CLASS SNAPSHOT via tools/run_graft.sh (same JVM
#    flags sbt forked with), immune to concurrent recompiles;
#  - Bench's action is the r8 elimination-proof fullEval (xxhash64 over
#    all columns), a small constant overhead vs r6's count().
set -u
cd /root/repo
RUN="bash tools/run_graft.sh"
LOG=/tmp/probe_metadex_r8.log
: > "$LOG"
echo "=== gates at 4 SFs ===" >> "$LOG"
for sf in /root/testdata/sf0.01 /root/testdata/sf0.1 /tmp/scale10 /tmp/scale100; do
  out=/tmp/mdx_verify_$(basename "$sf")
  rm -rf "$out"
  SPARK_GRAFT_ONLY=metadex_settlement,metadex_remaining SPARK_GRAFT_CPUS=32 \
    $RUN graft.Verify "$sf" "$out" >> "$LOG" 2>&1
  echo "--- check $sf ---" >> "$LOG"
  python3 tools/check.py "$sf" "$out" metadex_settlement metadex_remaining >> "$LOG" 2>&1
done
echo "=== bench decades ===" >> "$LOG"
for d in "/root/testdata/sf0.1 3" "/tmp/scale10 3" "/tmp/scale100 3" "/tmp/scale1000 1"; do
  set -- $d
  echo "--- bench $1 runs=$2 ---" >> "$LOG"
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_RUNS=$2 \
    SPARK_GRAFT_ONLY=metadex_settlement \
    $RUN graft.Bench 2>/dev/null | tail -2 >> "$LOG"
done
echo "=== probe done ===" >> "$LOG"
