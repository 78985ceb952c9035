#!/bin/bash
# Price the PROCESS BOUNDARY (r12 verdict ask #2): interleaved A/B of
# the top-10 heaviest gates under local[32] (A) vs
# local-cluster[2,16,4096] (B) — same box, same class snapshot, fresh
# JVM per leg, alternating A B A B ... so box drift hits both legs
# equally. Round 12 proved the typed folds SERIALIZE correctly across
# executor JVMs; this measures what that costs — a Kryo/encoder hot
# spot in LedgerDecoder/GroupRuns at scale is the perf-bug class
# local[32] structurally hides.
#
# Usage: tools/ab_mjvm_price.sh [ROUNDS] [SF_DIR]
# Output: /tmp/mjvm_price_{a,b}_N.json bench lines; summarize with
#   python3 tools/ab_analyze.py /tmp/mjvm_price_a_*.json /tmp/mjvm_price_b_*.json
set -u
cd /root/repo
ROUNDS="${1:-3}"
SF="${2:-/root/testdata/sf0.1}"
QUERIES="m4_reorg_flagship,streaming_reorg_equiv,streaming_chain_equiv,e2e_ingest_full,streaming_sessions_file,streaming_txstats_file,dedup_minhash_lsh,streaming_balances_file,streaming_sessions_equiv,e2e_ingest_chain"
CL="${GRAFT_CLASSES:-/tmp/graft_classes}"
SPEC="${GRAFT_MJVM_SPEC:-local-cluster[2,16,4096]}"

for i in $(seq 1 "$ROUNDS"); do
  echo "=== round $i leg A (local[32]) ==="
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_RUNS=1 \
  GRAFT_CLASSES="$CL" \
    timeout 2400 tools/run_graft.sh graft.Bench \
    2>/tmp/mjvm_price_a_$i.err | tail -1 > /tmp/mjvm_price_a_$i.json
  echo "rc=$? $(cut -c1-120 /tmp/mjvm_price_a_$i.json)"
  echo "=== round $i leg B ($SPEC) ==="
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_RUNS=1 \
  GRAFT_CLASSES="$CL" \
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  GRAFT_MASTER="$SPEC" \
  GRAFT_SPARK_OPTS="-Dspark.executor.extraClassPath=$CL" \
    timeout 2400 tools/run_graft.sh graft.Bench \
    2>/tmp/mjvm_price_b_$i.err | tail -1 > /tmp/mjvm_price_b_$i.json
  echo "rc=$? $(cut -c1-120 /tmp/mjvm_price_b_$i.json)"
done
