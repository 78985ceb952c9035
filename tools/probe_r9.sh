#!/bin/bash
# Round-9 decade probes (r8 verdict ask #3): the r8-new heavyweights
# run up the scale ladder with the single-run protocol
# (SPARK_GRAFT_RUNS=1 - one run is minutes at 1000x; box variance is
# dwarfed by the decade signal), via the class-snapshot runner so the
# probe is immune to concurrent edits.
#   streaming_chain_equiv : does the tail-range incremental contract
#                           hold when state and sink span 3 decades?
#   metadex_remaining     : the r8 one-join fold's scaling
#   dedup_semantic_sqrtk  : >=1M vectors (2M at scale1000e, k~1415,
#                           derived banding must collapse to R=1)
# Usage: tools/probe_r9.sh [logfile]
set -u
LOG="${1:-/tmp/probe_r9.log}"
: > "$LOG"
run() { # run <sfdir> <queries>
  echo "=== $2 @ $1 ===" >> "$LOG"
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_RUNS=1 \
    SPARK_GRAFT_ONLY="$2" tools/run_graft.sh graft.Bench 2>>"$LOG.err" \
    | grep '"metric":"total_detail"' >> "$LOG"
}
for d in /root/testdata/sf0.1 /tmp/scale10 /tmp/scale100 /tmp/scale1000; do
  run "$d" metadex_remaining
done
for d in /root/testdata/sf0.1 /tmp/scale10 /tmp/scale100 /tmp/scale1000; do
  run "$d" streaming_chain_equiv
done
for d in /root/testdata/sf0.1 /tmp/scale10e /tmp/scale100e /tmp/scale1000e; do
  run "$d" dedup_semantic_sqrtk
done
echo "=== done ===" >> "$LOG"
