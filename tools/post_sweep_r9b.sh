#!/bin/bash
# Round-9 post-sweep chain (v3): once the 1000x full-registry sweep
# exits,
# (0) refresh the class snapshot (the registry overflow fix landed
#     mid-sweep; the sweep itself kept its immutable snapshot),
# (1) run the round-standard sf0.1 full Verify + pandas-mode check
#     FIRST (the round's critical artifact — stragglers can outlive
#     the session, this must not),
# (2) run the final sf0.1 bench over the 142-query registry,
# (3) re-check every 1000x straggler standalone, parsed from the
#     sweep log's FAIL lines, with whole-box limits:
#     - oracle OOM/spill (mm_resize, text_cdc_chunks, ledger_send_all,
#       metadex_settlement): GRAFT_DUCK_MEM=100GB once the sweep JVM
#       is gone, and the whole scratch disk for spill;
#     - property_registry: tally overflow fixed in 773db85 -> re-run
#       on the refreshed snapshot;
#     - MemoryStream replay harnesses (streaming_balances_equiv and
#       class): the feed collect is DRIVER-BOUNDED BY DESIGN -> raise
#       spark.driver.maxResultSize to 8g for the harness (the
#       file-source gates streaming_chain/reorg_equiv own the
#       unbounded-scale story);
#     - s11_bucketed_table: UNABLE_TO_ACQUIRE_MEMORY under the shared
#       32-thread sweep JVM -> standalone run, 48g heap.
# Usage: tools/post_sweep_r9b.sh SWEEP_PID
set -u
SWEEP_PID="$1"
while kill -0 "$SWEEP_PID" 2>/dev/null; do sleep 30; done
echo "=== sweep exited; starting post-sweep chain v3 $(date -u +%H:%M:%S) ==="

echo "--- step 0: refresh class snapshot ---"
rm -rf /tmp/graft_classes
cp -r target/scala-2.13/classes /tmp/graft_classes

echo "--- step 1: sf0.1 full registry ---"
rm -rf /tmp/v01_full
SPARK_GRAFT_CPUS=32 tools/run_graft.sh graft.Verify \
  /root/testdata/sf0.1 /tmp/v01_full > /tmp/v01_full.log 2>&1
python3 tools/check.py /root/testdata/sf0.1 /tmp/v01_full \
  > /tmp/check01.log 2>/dev/null
tail -3 /tmp/check01.log

echo "--- step 2: final sf0.1 bench, 142 queries ---"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  tools/run_graft.sh graft.Bench > /tmp/bench_r9_final.log 2>/dev/null
tail -1 /tmp/bench_r9_final.log | head -c 400
echo

echo "--- step 3: 1000x straggler re-checks ---"
stragglers=$(grep '^FAIL' /tmp/sweep1000.log | sed 's/^FAIL \([a-z0-9_]*\):.*/\1/' | sort -u)
echo "stragglers: $stragglers"
for q in $stragglers; do
  rm -rf "/tmp/straggler_1000_$q"
  timeout 5400 env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$q" \
    SPARK_GRAFT_OUT_PARTS=32 SPARK_DRIVER_MEM=48g \
    GRAFT_SPARK_OPTS="-Dspark.driver.maxResultSize=8g" \
    tools/run_graft.sh graft.Verify /tmp/scale1000 "/tmp/straggler_1000_$q" \
    > "/tmp/straggler_1000_$q.verify.log" 2>&1
  rc=$?
  [ $rc -ne 0 ] && echo "VERIFY-ERR rc=$rc $q"
  timeout 3600 env GRAFT_DUCK_MEM=100GB python3 tools/check.py --hash \
    /tmp/scale1000 "/tmp/straggler_1000_$q" "$q" 2>/dev/null
  rm -rf "/tmp/straggler_1000_$q"
done
echo "=== post-sweep chain v3 done $(date -u +%H:%M:%S) ==="
