#!/bin/bash
# Round-9 final measurement phase: runs on a QUIET box once the v4
# straggler mop-up exits.
# (1) sort-residual measurement: the full registry under
#     SPARK_GRAFT_ACTION=ordered (executes the final presentation
#     ORDER BY that fullEval's wrapper eliminates) — single run per
#     query; the residual is read per-query against the fullEval
#     baseline, so the 3-run median protocol's cost isn't paid twice;
# (2) the round's final fullEval bench over all 142 queries (standard
#     3-run-median protocol), run LAST so BENCH_DETAIL.json ends the
#     round holding the honest reported action.
# Uses the fresh build output directly (the /tmp/graft_classes
# snapshot predates the ordered action and stays immutable for any
# still-running probes).
# Usage: tools/final_phase_r9.sh V4_PID
set -u
V4_PID="$1"
while kill -0 "$V4_PID" 2>/dev/null; do sleep 30; done
echo "=== v4 exited; final phase $(date -u +%H:%M:%S) ==="
CLS=target/scala-2.13/classes

echo "--- ordered-action sweep (sort residual) ---"
GRAFT_CLASSES=$CLS SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ACTION=ordered SPARK_GRAFT_RUNS=1 \
  tools/run_graft.sh graft.Bench > /tmp/bench_r9_ordered.log 2>/dev/null
grep -o '{"metric":"total_detail".*' /tmp/bench_r9_ordered.log \
  | head -1 > /tmp/bench_r9_ordered.json
echo "ordered total: $(python3 -c "import json;print(json.load(open('/tmp/bench_r9_ordered.json'))['value'])" 2>/dev/null)"

echo "--- final fullEval bench, 142 queries ---"
GRAFT_CLASSES=$CLS SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_CPUS=32 \
  tools/run_graft.sh graft.Bench > /tmp/bench_r9_final2.log 2>/dev/null
tail -1 /tmp/bench_r9_final2.log | head -c 300
echo
echo "=== final phase done $(date -u +%H:%M:%S) ==="
