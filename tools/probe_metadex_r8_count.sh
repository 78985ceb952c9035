#!/bin/bash
# Apples-to-apples leg of the r8 metadex re-probe: the LEGACY count()
# action (what rounds 5-6 measured with), to compare the r7 narrowing
# against r6's 71.7s/1044s without the r8 action change confounding it.
set -u
cd /root/repo
RUN="bash tools/run_graft.sh"
LOG=/tmp/probe_metadex_r8_count.log
: > "$LOG"
for d in "/root/testdata/sf0.1 3" "/tmp/scale10 3" "/tmp/scale100 3" "/tmp/scale1000 1"; do
  set -- $d
  echo "--- bench-count $1 runs=$2 ---" >> "$LOG"
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_RUNS=$2 \
    SPARK_GRAFT_ONLY=metadex_settlement SPARK_GRAFT_ACTION=count \
    $RUN graft.Bench 2>/dev/null | tail -2 >> "$LOG"
done
echo "=== probe done ===" >> "$LOG"
