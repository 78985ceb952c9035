#!/bin/bash
# Round-11 ask #1: measure the VERIFICATION FRONTIER of the four rows
# whose 1000x standing was engine-digest-only (e2e_ingest_full,
# m4_reorg_flagship, dedup_minhash_lsh, dedup_incremental — their
# INLINED DuckDB oracles exhausted this box's spill disk at 1000x).
# For one scale FACTOR: generate the scaled dir if absent, then per
# query run a fresh engine Verify and the order-free --hash oracle,
# logging OK/FAIL. Walking factors upward turned "the oracle can't at
# 1000x" into a measured largest-green scale per row (250x green /
# 400x disk-bound), and after the oracle CTEs went AS MATERIALIZED
# (PERF.md r11) the same protocol ran ALL FOUR green at 1000x — the
# script now doubles as the full-protocol re-run tool for any factor.
#
# The box must be QUIET: the oracle needs most of the RAM once the
# Spark JVM exits (the r10 phase-A lesson: a concurrent JVM turns a
# real pass into a spurious malloc death).
#
# Usage: tools/bisect_oracle.sh FACTOR [query...]
set -u
F="$1"; shift
QS=("$@")
[ ${#QS[@]} -eq 0 ] && QS=(dedup_incremental dedup_minhash_lsh \
                           e2e_ingest_full m4_reorg_flagship)
SF="/tmp/scale$F"
LOG="/tmp/bisect_$F.log"
OUT="/tmp/bisect_out_$F"
log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

if [ ! -d "$SF/lineitem.parquet" ]; then
  log "=== generating $SF (factor $F) ==="
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=32g \
    tools/run_graft.sh graft.ScaleGen /root/testdata/sf0.1 "$SF" "$F" \
    >> "$LOG.err" 2>&1 || { log "SCALEGEN-ERR rc=$?"; exit 1; }
  log "scalegen done: $(du -sh "$SF" | cut -f1)"
fi

for q in "${QS[@]}"; do
  rm -rf "$OUT"
  log "=== $q @ ${F}x: engine verify ==="
  timeout "${BISECT_VERIFY_TIMEOUT:-5400}" env \
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$q" \
    SPARK_GRAFT_OUT_PARTS=32 SPARK_DRIVER_MEM=48g \
    GRAFT_SHUFFLE_CODEC=zstd \
    GRAFT_SPARK_OPTS="-Dspark.driver.maxResultSize=8g" \
    tools/run_graft.sh graft.Verify "$SF" "$OUT" \
    > "/tmp/bisect_${F}_$q.verify.log" 2>&1
  rc=$?
  if [ $rc -ne 0 ]; then
    log "VERIFY-ERR rc=$rc $q @ ${F}x"
    continue
  fi
  log "engine done; oracle starting (quiet-box DuckDB)"
  timeout "${BISECT_CHECK_TIMEOUT:-7200}" env GRAFT_DUCK_MEM=72GB \
    python3 tools/check.py --hash "$SF" "$OUT" "$q" \
    2>> "$LOG.err" | grep -E '^(OK|FAIL|SKIP)' >> "$LOG"
  [ ${PIPESTATUS[0]} -eq 124 ] && log "CHECK-TIMEOUT $q @ ${F}x"
  rm -rf "$OUT"
done
rm -rf "$OUT"
log "=== bisect ${F}x done ==="
