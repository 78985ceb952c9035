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
# Only the v3 attempts that were INVALIDATED are worth repeating:
# dedup_incremental and dedup_minhash_lsh ran while ~45 GB of
# deleted-open spill from the live sweep JVM had the scratch disk at
# zero, and e2e_ingest_full's oracle ran before check.py dropped
# DuckDB insertion-order preservation (the change that took
# metadex_settlement's 540M-row oracle from disk-dead to hash-green).
# Everything else v3 re-checked under its final config, and those
# outcomes are the answer: m4_reorg_flagship's ENGINE needs >60 GB of
# sort spill at 1000x (two flagship serves), mm_resize's oracle holds
# 5M unspillable string_agg states past the box's RAM, and the three
# MemoryStream replay harnesses hit the JVM's 2 GB single-array limit
# collecting the 1000x feed — driver-bounded BY DESIGN (the
# file-source gates own unbounded scale and are 1000x-green).
redo="dedup_incremental dedup_minhash_lsh e2e_ingest_full"
while kill -0 "$V3_PID" 2>/dev/null; do sleep 30; done
echo "=== v3 chain exited; mop-up v4 $(date -u +%H:%M:%S) ==="
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
