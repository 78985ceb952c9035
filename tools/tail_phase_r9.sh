#!/bin/bash
# Round-9 tail phase: last-chance 1000x re-checks with two fixes the
# earlier attempts lacked.
#  - zstd shuffle/spill compression: the two remaining ENGINE-side
#    disk bounds (dedup_minhash_lsh >50 GB, m4_reorg_flagship >60 GB
#    of lz4 spill) shuffle text-heavy rows that zstd compresses far
#    better; if that fits in the box's ~60 GB this flips an
#    engine-bound row to hash-green.
#  - GRAFT_DUCK_MEM=72GB: at 100GB the kernel OOM-killed the
#    dedup_incremental oracle (cap too close to physical RAM with
#    DuckDB overhead on top); 72 GB makes DuckDB spill or error
#    inside its own limit instead.
# Order: cheapest-to-flip first, m4 (the longest shot) last.
# Usage: tools/tail_phase_r9.sh FINAL_PHASE_PID
set -u
FP="$1"
while kill -0 "$FP" 2>/dev/null; do sleep 30; done
echo "=== final phase exited; tail phase $(date -u +%H:%M:%S) ==="
for q in dedup_incremental e2e_ingest_full dedup_minhash_lsh m4_reorg_flagship; do
  rm -rf "/tmp/straggler_1000_$q"
  timeout 5400 env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$q" \
    SPARK_GRAFT_OUT_PARTS=32 SPARK_DRIVER_MEM=48g \
    GRAFT_SHUFFLE_CODEC=zstd \
    GRAFT_SPARK_OPTS="-Dspark.driver.maxResultSize=8g" \
    tools/run_graft.sh graft.Verify /tmp/scale1000 "/tmp/straggler_1000_$q" \
    > "/tmp/straggler_1000_$q.verify.log" 2>&1
  rc=$?
  [ $rc -ne 0 ] && echo "VERIFY-ERR rc=$rc $q"
  timeout 3600 env GRAFT_DUCK_MEM=72GB python3 tools/check.py --hash \
    /tmp/scale1000 "/tmp/straggler_1000_$q" "$q" 2>/dev/null
  rm -rf "/tmp/straggler_1000_$q"
done
echo "=== tail phase done $(date -u +%H:%M:%S) ==="
