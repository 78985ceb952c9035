#!/bin/bash
# Round-9 post-sweep chain (v2): once the 1000x full-registry sweep
# exits,
# (0) refresh the class snapshot (the registry overflow fix landed
#     mid-sweep; the sweep itself kept its immutable snapshot),
# (1) re-check the three 1000x stragglers standalone:
#     - mm_resize / text_cdc_chunks: oracle OOM at the sweep's 48GB
#       cap -> whole-box oracle via GRAFT_DUCK_MEM,
#     - property_registry: tally overflow fixed in 773db85 -> re-run
#       with the new code,
# (2) run the round-standard sf0.1 full Verify + pandas-mode check,
# (3) run the final sf0.1 bench over the 142-query registry.
# Usage: tools/post_sweep_r9.sh SWEEP_PID
set -u
SWEEP_PID="$1"
while kill -0 "$SWEEP_PID" 2>/dev/null; do sleep 30; done
echo "=== sweep exited; starting post-sweep chain $(date -u +%H:%M:%S) ==="

echo "--- step 0: refresh class snapshot ---"
rm -rf /tmp/graft_classes
cp -r target/scala-2.13/classes /tmp/graft_classes

echo "--- step 1: 1000x straggler re-checks ---"
for q in mm_resize text_cdc_chunks property_registry; do
  rm -rf "/tmp/straggler_1000_$q"
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$q" SPARK_GRAFT_OUT_PARTS=32 \
    tools/run_graft.sh graft.Verify /tmp/scale1000 "/tmp/straggler_1000_$q" \
    > "/tmp/straggler_1000_$q.verify.log" 2>&1
  GRAFT_DUCK_MEM=100GB python3 tools/check.py --hash \
    /tmp/scale1000 "/tmp/straggler_1000_$q" "$q" 2>/dev/null
  rm -rf "/tmp/straggler_1000_$q"
done

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
