#!/bin/bash
# Round-10 end-of-round sequence (quiet box required):
#  1. full-registry Verify + oracle at sf0.1 (the once-per-round 10x
#     sweep the verify skill prescribes)
#  2. zstd-vs-lz4 bench A/B at sf0.1 (r9 ask #4 confirmation)
#  3. canonical fullEval bench -> BENCH_DETAIL.json, copied to
#     BENCH_LOCAL_r10.json (the per-round artifact bench_diff reads)
#  4. bench_diff vs the r9 canonical baseline
set -u
cd /root/repo
LOG=/tmp/r10_final.log
CL=/tmp/graft_classes_final
rm -rf "$CL"; cp -r target/scala-2.13/classes "$CL"
export GRAFT_CLASSES="$CL"
log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

log "=== 1: sf0.1 registry sweep ==="
rm -rf /tmp/verify_sf01_r10
SPARK_GRAFT_CPUS=32 timeout 5400 tools/run_graft.sh graft.Verify \
  /root/testdata/sf0.1 /tmp/verify_sf01_r10 >> "$LOG.err" 2>&1
log "verify rc=$?"
timeout 5400 tools/sweep_check.sh --hash /root/testdata/sf0.1 \
  /tmp/verify_sf01_r10 15 >> "$LOG" 2>>"$LOG.err"
log "sf0.1 check done"

log "=== 2: zstd A/B at sf0.1 ==="
tools/ab_zstd.sh 2 >> "$LOG" 2>>"$LOG.err"

log "=== 3: canonical bench (fullEval, 3-run medians) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  timeout 5400 tools/run_graft.sh graft.Bench \
  > /tmp/bench_r10_final.log 2>&1
log "bench rc=$?"
cp BENCH_DETAIL.json BENCH_LOCAL_r10.json
tail -c 600 /tmp/bench_r10_final.log >> "$LOG"

log "=== 4: regression diff vs r9 canonical ==="
python3 tools/bench_diff.py BENCH_LOCAL_r09.json BENCH_LOCAL_r10.json \
  >> "$LOG" 2>&1
log "=== final done ==="
