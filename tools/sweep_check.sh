#!/bin/bash
# Full-registry scaled sweep oracle, chunked (r8 finding, formalized
# per the r9 ask): one long-lived python/DuckDB process accumulates
# allocator state across 100+ scaled comparisons and eventually fails
# tiny allocations ("bad allocation") even with free RAM — an
# oracle-harness limit, not an engine mismatch. A fresh check.py
# process per chunk sidesteps it reproducibly.
# Usage: tools/sweep_check.sh [--hash] SF_DIR OUT_DIR [CHUNK_SIZE]
# (run graft.Verify SF_DIR OUT_DIR first; this only compares)
# --hash: memory-bounded DuckDB-side hash compare (see check.py) —
# the mode for 1000x sweeps where pandas frames would not fit.
set -u
HASHFLAG=""
if [ "$1" = "--hash" ]; then HASHFLAG="--hash"; shift; fi
SF="$1"; OUT="$2"; CHUNK="${3:-15}"
names=$(cd "$OUT" && ls -d */ 2>/dev/null | tr -d '/')
total_ok=0; total_fail=0; total_skip=0
chunk=()
run_chunk() {
  [ ${#chunk[@]} -eq 0 ] && return
  out=$(python3 "$(dirname "$0")/check.py" $HASHFLAG "$SF" "$OUT" "${chunk[@]}" 2>&1)
  echo "$out" | grep -E '^(OK|FAIL|SKIP)'
  total_ok=$((total_ok + $(echo "$out" | grep -c '^OK') ))
  total_fail=$((total_fail + $(echo "$out" | grep -c '^FAIL') ))
  total_skip=$((total_skip + $(echo "$out" | grep -c '^SKIP') ))
  chunk=()
}
for n in $names; do
  chunk+=("$n")
  [ ${#chunk[@]} -ge "$CHUNK" ] && run_chunk
done
run_chunk
echo "TOTAL: $total_ok ok, $total_fail fail, $total_skip skip (no oracle)"
[ "$total_fail" -eq 0 ]
