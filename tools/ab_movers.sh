#!/bin/bash
# Interleaved same-box A/B over a query subset: BASE vs NEW class
# snapshots, fresh JVM per run, alternating B/N/B/N so box drift
# cancels, min-fold per side. This is the canonical drift-vs-build
# attribution instrument (r10 PERF: cross-round raw diffs carry
# ±5-16% box drift that only an interleaved A/B resolves).
# Usage: tools/ab_movers.sh BASE_CLASSES NEW_CLASSES QUERY_CSV [ROUNDS]
set -u
BASE="$1"; NEW="$2"; CSV="$3"; ROUNDS="${4:-3}"
for i in $(seq 1 "$ROUNDS"); do
  for side in base new; do
    cls="$BASE"; [ "$side" = new ] && cls="$NEW"
    GRAFT_CLASSES="$cls" SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      SPARK_GRAFT_CPUS=32 SPARK_GRAFT_RUNS=1 SPARK_GRAFT_ONLY="$CSV" \
      tools/run_graft.sh graft.Bench 2>/dev/null \
      | grep -o '{"metric":"total_detail".*' | head -1 \
      > "/tmp/ab_movers_${side}_$i.json"
  done
  echo "round $i/$ROUNDS done"
done
python3 - "$ROUNDS" <<'EOF'
import json
import sys
rounds = int(sys.argv[1])


def fold(side):
    runs = [json.load(open(f"/tmp/ab_movers_{side}_{i}.json"))
            for i in range(1, rounds + 1)]
    return {q: min(r["queries"][q] for r in runs)
            for q in runs[0]["queries"]}


b, n = fold("base"), fold("new")
tb, tn = sum(b.values()), sum(n.values())
print(f"\ninterleaved A/B (min-fold over {rounds} rounds/side): "
      f"base {tb:.1f}s -> new {tn:.1f}s ({(tn - tb) / tb:+.1%})")
for q in sorted(b, key=lambda q: b[q] - n[q]):
    d = n[q] - b[q]
    verdict = ("REAL" if abs(d) > 0.3 and
               max(b[q], n[q]) > 1.3 * min(b[q], n[q]) else "drift-band")
    print(f"  {q}: {b[q]:.2f}s -> {n[q]:.2f}s ({d:+.2f}s, {verdict})")
EOF
