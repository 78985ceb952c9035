#!/bin/bash
# Round-9 straggler mop-up (v4): the v3 chain's first two re-checks
# (dedup_incremental's oracle, dedup_minhash_lsh's Verify spill) died
# on a full scratch disk — ~45 GB of deleted-open spill held by the
# in-flight sweep JVM plus stale sink scratch, since reclaimed (60 GB
# free). Wait for the v3 chain (PID $1) to finish its remaining
# stragglers, then re-run exactly the queries whose v3 re-check did
# not end hash-green, parsed from the v3 log itself, with the same
# standalone limits (48 g heap, 8 g maxResultSize, 100 GB oracle).
# Usage: tools/post_sweep_r9c.sh V3_PID V3_LOG
set -u
V3_PID="$1"; V3_LOG="${2:-/tmp/post_sweep_r9b.log}"
# Settled one-box bounds — no point re-burning 30+ min each:
# m4_reorg_flagship's ENGINE needs >60 GB spill at 1000x (two full
# flagship serves; its standalone 48g re-run died in
# UnsafeExternalSorter spill on the empty scratch disk), and
# metadex_settlement's engine already hash-passed 1000x in the r8
# dedicated probe while its oracle exceeds the box's spill.
# metadex_settlement's v3 re-check is already running with the final
# harness config (streamed, order-free oracle); repeating an identical
# attempt in v4 adds nothing whichever way it lands.
SKIP="m4_reorg_flagship
metadex_settlement"
while kill -0 "$V3_PID" 2>/dev/null; do sleep 30; done
echo "=== v3 chain exited; mop-up v4 $(date -u +%H:%M:%S) ==="
# A straggler is settled iff the v3 log has an OK line for it.
redo=$(grep '^FAIL' /tmp/sweep1000.log | sed 's/^FAIL \([a-z0-9_]*\):.*/\1/' | sort -u |
       while read -r q; do grep -q "^OK   $q " "$V3_LOG" || echo "$q"; done |
       grep -vxF "$SKIP")
echo "redo: $redo"
for q in $redo; do
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
echo "=== mop-up v4 done $(date -u +%H:%M:%S) ==="
