#!/bin/bash
# Same-conditions A/B of the two elimination-proof bench actions over
# the queries with the biggest ordered-vs-baseline deltas: one fresh
# JVM per action, identical query set, single run each (both sides
# carry first-run codegen, so the pairwise delta isolates what the
# ACTION executes — the sorts EliminateSorts removes beneath the
# order-insensitive fold — from single-run JVM noise).
# Usage: tools/ab_sort_action.sh [QUERY_CSV]
set -u
Q="${1:-dedup_minhash_lsh,e2e_ingest,dex_lifecycle_fold,dedup_retention,dedup_simhash,dedup_semantic,e2e_ingest_chain,btc_utxo_ledger}"
CLS=target/scala-2.13/classes
for action in fulleval ordered; do
  GRAFT_CLASSES=$CLS SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_RUNS=1 SPARK_GRAFT_ONLY="$Q" \
    SPARK_GRAFT_ACTION=$action \
    tools/run_graft.sh graft.Bench 2>/dev/null \
    | grep -o '{"metric":"total_detail".*' | head -1 \
    > "/tmp/ab_action_$action.json"
  echo "$action: $(python3 -c "import json;print(json.load(open('/tmp/ab_action_$action.json'))['value'])")"
done
python3 tools/sort_residual.py /tmp/ab_action_ordered.json /tmp/ab_action_fulleval.json 10
