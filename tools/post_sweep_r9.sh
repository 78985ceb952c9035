#!/bin/bash
# Round-9 post-sweep chain: once the 1000x full-registry sweep exits,
# (1) re-check mm_resize at 1000x standalone with the whole-box oracle
#     (its ordered-string_agg oracle OOMed at the sweep's 48GB cap),
# (2) run the round-standard sf0.1 full Verify + pandas-mode check,
# (3) run the final sf0.1 bench over the 142-query registry.
# Usage: tools/post_sweep_r9.sh SWEEP_PID
set -u
SWEEP_PID="$1"
while kill -0 "$SWEEP_PID" 2>/dev/null; do sleep 30; done
echo "=== sweep exited; starting post-sweep chain $(date -u +%H:%M:%S) ==="

echo "--- step 1: mm_resize @1000x, whole-box oracle ---"
rm -rf /tmp/mm_resize_1000
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY=mm_resize SPARK_GRAFT_OUT_PARTS=32 \
  tools/run_graft.sh graft.Verify /tmp/scale1000 /tmp/mm_resize_1000 \
  > /tmp/mm_resize_1000.verify.log 2>&1
GRAFT_DUCK_MEM=100GB python3 tools/check.py --hash \
  /tmp/scale1000 /tmp/mm_resize_1000 mm_resize 2>/dev/null
rm -rf /tmp/mm_resize_1000

echo "--- step 2: sf0.1 full registry ---"
rm -rf /tmp/v01_full
SPARK_GRAFT_CPUS=32 tools/run_graft.sh graft.Verify \
  /root/testdata/sf0.1 /tmp/v01_full > /tmp/v01_full.log 2>&1
python3 tools/check.py /root/testdata/sf0.1 /tmp/v01_full \
  > /tmp/check01.log 2>/dev/null
tail -3 /tmp/check01.log

echo "--- step 3: final sf0.1 bench, 142 queries ---"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  tools/run_graft.sh graft.Bench > /tmp/bench_r9_final.log 2>/dev/null
tail -1 /tmp/bench_r9_final.log | head -c 400
echo
echo "=== post-sweep chain done $(date -u +%H:%M:%S) ==="
