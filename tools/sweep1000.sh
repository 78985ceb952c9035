#!/bin/bash
# Full-registry 1000x sweep (r9 ask #4): batches of queries are
# Verified at the scaled dir, compared with the memory-bounded --hash
# oracle (fresh check.py process per batch - the chunked-oracle
# protocol), and their outputs DELETED before the next batch so the
# scratch disk never holds more than one batch of 1000x results.
# Order file lists cheap queries first so the long fact-heavy tail
# lands at the end and a bounded run still covers most of the
# registry. Timeouts make a single pathological query a documented
# bound instead of a stalled sweep.
# Usage: tools/sweep1000.sh SF_DIR ORDER_FILE [BATCH] [LOG]
set -u
SF="$1"; ORDER="$2"; BATCH="${3:-8}"; LOG="${4:-/tmp/sweep1000.log}"
OUT=/tmp/sweep1000_out
VT="${SWEEP_VERIFY_TIMEOUT:-7200}"   # per-batch Spark budget (s)
CT="${SWEEP_CHECK_TIMEOUT:-3600}"    # per-batch oracle budget (s)
# Scaled-sweep fan-out/memory, set HERE so no caller can forget them
# (r9: Verify's driver-contract coalesce(1) default turned a 150M-row
# decode into a single-core grind before anyone noticed):
export SPARK_GRAFT_OUT_PARTS="${SPARK_GRAFT_OUT_PARTS:-32}"
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-32g}"
export GRAFT_DUCK_MEM="${GRAFT_DUCK_MEM:-56GB}"
# zstd at 1000x is fit-vs-die for the text-heavy shuffles (engine
# default is lz4 per the sf0.1 A/B — PERF.md round 10):
export GRAFT_SHUFFLE_CODEC="${GRAFT_SHUFFLE_CODEC:-zstd}"
: > "$LOG"
mapfile -t names < "$ORDER"
i=0
while [ $i -lt ${#names[@]} ]; do
  chunk=("${names[@]:$i:$BATCH}")
  i=$((i + BATCH))
  csv=$(IFS=,; echo "${chunk[*]}")
  echo "=== batch: $csv ===" >> "$LOG"
  rm -rf "$OUT"
  timeout "$VT" env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$csv" \
    tools/run_graft.sh graft.Verify "$SF" "$OUT" \
    >> "$LOG.err" 2>&1
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "VERIFY-TIMEOUT/ERR rc=$rc batch: $csv" >> "$LOG"
  fi
  timeout "$CT" python3 tools/check.py --hash "$SF" "$OUT" "${chunk[@]}" \
    2>>"$LOG.err" | grep -E '^(OK|FAIL|SKIP)' >> "$LOG"
  [ ${PIPESTATUS[0]} -eq 124 ] && echo "CHECK-TIMEOUT batch: $csv" >> "$LOG"
done
rm -rf "$OUT"
echo "=== sweep done: $(grep -c '^OK' "$LOG") ok, $(grep -c '^FAIL' "$LOG") fail ===" >> "$LOG"
