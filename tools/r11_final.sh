#!/bin/bash
# Round-11 end-of-round sequence (quiet box required) — r10 ask #7:
# the bench section is ONE command, drift-attributed by construction.
#  1. full-registry Verify + oracle at sf0.1 (the once-per-round 10x
#     sweep)
#  2. canonical fullEval bench -> BENCH_DETAIL.json, copied to
#     BENCH_LOCAL_r11.json
#  3. bench_diff vs the r10 canonical baseline
#  4. interleaved A/B (HEAD classes vs the r10-final build, fresh JVM
#     per run, alternating) over the top-10 movers bench_diff reports —
#     every cross-round delta arrives pre-attributed as REAL vs
#     drift-band instead of needing a hand-run follow-up
set -u
cd /root/repo
LOG=/tmp/r11_final.log
CL=/tmp/graft_classes_final_r11
R10_COMMIT="${R10_COMMIT:-6178f85}"
rm -rf "$CL"; cp -r target/scala-2.13/classes "$CL"
export GRAFT_CLASSES="$CL"
log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

log "=== 0: build the r10 baseline snapshot ($R10_COMMIT) ==="
if [ ! -d /tmp/graft_classes_r10base ]; then
  rm -rf /tmp/r10_tree
  git worktree add -f /tmp/r10_tree "$R10_COMMIT" >> "$LOG.err" 2>&1
  (cd /tmp/r10_tree && sbt -batch compile) >> "$LOG.err" 2>&1
  cp -r /tmp/r10_tree/target/scala-2.13/classes /tmp/graft_classes_r10base
  git worktree remove --force /tmp/r10_tree >> "$LOG.err" 2>&1
fi

log "=== 1: sf0.1 registry sweep ==="
rm -rf /tmp/verify_sf01_r11
SPARK_GRAFT_CPUS=32 timeout 5400 tools/run_graft.sh graft.Verify \
  /root/testdata/sf0.1 /tmp/verify_sf01_r11 >> "$LOG.err" 2>&1
log "verify rc=$?"
timeout 5400 tools/sweep_check.sh --hash /root/testdata/sf0.1 \
  /tmp/verify_sf01_r11 15 >> "$LOG" 2>>"$LOG.err"
log "sf0.1 check done"

log "=== 2: canonical bench (fullEval, 3-run medians) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  timeout 5400 tools/run_graft.sh graft.Bench \
  > /tmp/bench_r11_final.log 2>&1
log "bench rc=$?"
cp BENCH_DETAIL.json BENCH_LOCAL_r11.json
tail -c 600 /tmp/bench_r11_final.log >> "$LOG"

log "=== 3: regression diff vs r10 canonical ==="
python3 tools/bench_diff.py BENCH_LOCAL_r10.json BENCH_LOCAL_r11.json \
  >> "$LOG" 2>&1

log "=== 4: interleaved A/B over the top-10 movers ==="
MOVERS=$(python3 tools/bench_diff.py --movers 10 \
  BENCH_LOCAL_r10.json BENCH_LOCAL_r11.json)
log "movers: $MOVERS"
tools/ab_movers.sh /tmp/graft_classes_r10base "$CL" "$MOVERS" 3 \
  >> "$LOG" 2>>"$LOG.err"
log "=== final done ==="
