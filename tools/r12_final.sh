#!/bin/bash
# Round-12 end-of-round sequence (quiet box required) — same
# drift-attributed shape as r11_final.sh, REORDERED so the canonical
# bench record lands first on a time-bounded box:
#  1. canonical fullEval bench -> BENCH_DETAIL.json -> BENCH_LOCAL_r12
#  2. bench_diff vs the r11 canonical baseline
#  3. interleaved A/B (HEAD vs r11-final build) over the top movers
#  4. full-registry Verify + oracle at sf0.1 (once-per-round 10x sweep)
#  5. full-registry Verify + oracle at sf0.01 under MULTI-JVM
#     (local-cluster[2,16,4096]) — the round-12 executor-boundary gate
set -u
cd /root/repo
LOG=/tmp/r12_final.log
CL=/tmp/graft_classes_final_r12
R11_COMMIT="${R11_COMMIT:-d093c85}"
rm -rf "$CL"; cp -r target/scala-2.13/classes "$CL"
export GRAFT_CLASSES="$CL"
log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

log "=== 0: r11 baseline snapshot ($R11_COMMIT) ==="
if [ ! -d /tmp/graft_classes_r11base ]; then
  rm -rf /tmp/r11_tree
  git worktree add -f /tmp/r11_tree "$R11_COMMIT" >> "$LOG.err" 2>&1
  (cd /tmp/r11_tree && sbt -batch compile) >> "$LOG.err" 2>&1
  cp -r /tmp/r11_tree/target/scala-2.13/classes /tmp/graft_classes_r11base
  git worktree remove --force /tmp/r11_tree >> "$LOG.err" 2>&1 || true
fi

log "=== 1: canonical bench (fullEval, 3-run medians) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  timeout 5400 tools/run_graft.sh graft.Bench \
  > /tmp/bench_r12_final.log 2>&1
log "bench rc=$?"
cp BENCH_DETAIL.json BENCH_LOCAL_r12.json
tail -c 600 /tmp/bench_r12_final.log >> "$LOG"

log "=== 2: regression diff vs r11 canonical ==="
python3 tools/bench_diff.py BENCH_LOCAL_r11.json BENCH_LOCAL_r12.json \
  >> "$LOG" 2>&1

log "=== 3: interleaved A/B over the top-10 movers ==="
MOVERS=$(python3 tools/bench_diff.py --movers 10 \
  BENCH_LOCAL_r11.json BENCH_LOCAL_r12.json)
log "movers: $MOVERS"
tools/ab_movers.sh /tmp/graft_classes_r11base "$CL" "$MOVERS" 3 \
  >> "$LOG" 2>>"$LOG.err"

log "=== 4: sf0.1 registry sweep ==="
rm -rf /tmp/verify_sf01_r12
SPARK_GRAFT_CPUS=32 timeout 5400 tools/run_graft.sh graft.Verify \
  /root/testdata/sf0.1 /tmp/verify_sf01_r12 >> "$LOG.err" 2>&1
log "verify rc=$?"
timeout 5400 tools/sweep_check.sh --hash /root/testdata/sf0.1 \
  /tmp/verify_sf01_r12 15 >> "$LOG" 2>>"$LOG.err"
log "sf0.1 check done"

log "=== 5: multi-JVM registry gate at sf0.01 ==="
rm -rf /tmp/graft_classes && cp -r "$CL" /tmp/graft_classes
GRAFT_CLASSES="$CL" timeout 5400 tools/run_multijvm.sh \
  /root/testdata/sf0.01 /tmp/verify_mjvm_r12 >> "$LOG.err" 2>&1
log "mjvm verify rc=$?"
python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_mjvm_r12 \
  2>>"$LOG.err" | tail -3 >> "$LOG"
log "mjvm check done"
log "=== final done ==="
