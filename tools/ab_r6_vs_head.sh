#!/bin/bash
# Clean-box A/B (r7 verdict ask #3): r6 snapshot (ce9a0b8) vs HEAD,
# interleaved in ONE session, 3 single-run invocations each, BOTH with
# the legacy count() action (r6's Bench hardcodes it; HEAD passes
# SPARK_GRAFT_ACTION=count) so the r8 action change cannot confound the
# drift attribution. Medians are computed offline from the 3 logs.
set -u
cd /root/repo
RUN="bash tools/run_graft.sh"
for i in 1 2 3; do
  echo "=== AB round $i : r6 ==="
  GRAFT_CLASSES=/tmp/graft_classes_r6 \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_RUNS=1 \
    $RUN graft.Bench 2>/dev/null | grep '"metric":"total_detail"' \
    > /tmp/ab_r6_$i.json
  echo "=== AB round $i : head ==="
  GRAFT_CLASSES=/tmp/graft_classes \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_RUNS=1 SPARK_GRAFT_ACTION=count \
    $RUN graft.Bench 2>/dev/null | grep '"metric":"total_detail"' \
    > /tmp/ab_head_$i.json
done
echo "=== AB done ==="
