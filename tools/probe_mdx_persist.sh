#!/bin/bash
# Task: measure the flagship's double-evaluated metadex dedup subtree
# (r7 verdict ask #7). Two class snapshots:
#   /tmp/graft_classes       — HEAD (no persist in MetaDexOps.derive)
#   /tmp/graft_classes_mdxp  — patched: deduped tuples persistScoped
# Times e2e_ingest_full (consumes BOTH derive outputs → pays the dedup
# join twice without the persist) and metadex_settlement (consumes the
# ledger only → the persist is pure overhead) at sf0.1, fullEval,
# interleaved 3x.
set -u
cd /root/repo
RUN="bash tools/run_graft.sh"
Q=e2e_ingest_full,metadex_settlement
for i in 1 2 3; do
  echo "=== round $i : nopersist ==="
  GRAFT_CLASSES=/tmp/graft_classes \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_RUNS=1 SPARK_GRAFT_ONLY=$Q \
    $RUN graft.Bench 2>/dev/null | grep total_detail > /tmp/mdxp_no_$i.json
  echo "=== round $i : persist ==="
  GRAFT_CLASSES=/tmp/graft_classes_mdxp \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_RUNS=1 SPARK_GRAFT_ONLY=$Q \
    $RUN graft.Bench 2>/dev/null | grep total_detail > /tmp/mdxp_yes_$i.json
done
echo "=== done ==="
