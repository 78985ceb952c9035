#!/bin/bash
# Same-conditions A/B of the engine's shuffle/spill codec at sf0.1.
# Round-10's version of this script was a DEAD KNOB (r10 ADVICE, high):
# it set -Dspark.io.compression.codec via GRAFT_SPARK_OPTS, but
# GraftConf sets the codec explicitly on the SparkSession builder and
# builder .config() overrides -D system properties — so both legs ran
# the same codec and the recorded "+9.8% zstd" never measured zstd.
# This version sets the env var GraftConf actually reads
# (GRAFT_SHUFFLE_CODEC) and VERIFIES each leg via the "codec" stamp
# Bench now reads back from the live session — a leg whose stamp
# disagrees aborts the A/B instead of recording garbage.
# Interleaved Z/L/Z/L runs, one fresh JVM each, full registry,
# single run per JVM: pairing adjacent runs cancels box drift, and
# comparing the two MINIMA per codec cancels cold-JIT noise.
# Usage: tools/ab_zstd.sh [ROUNDS]   (default 2 → 4 JVMs)
set -u
ROUNDS="${1:-2}"
CLS="${GRAFT_CLASSES:-target/scala-2.13/classes}"
for i in $(seq 1 "$ROUNDS"); do
  for codec in zstd lz4; do
    GRAFT_CLASSES=$CLS SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      SPARK_GRAFT_CPUS=32 SPARK_GRAFT_RUNS=1 \
      GRAFT_SHUFFLE_CODEC="$codec" GRAFT_BENCH_NO_ARTIFACT=1 \
      tools/run_graft.sh graft.Bench 2>/dev/null \
      | grep -o '{"metric":"total_detail".*' | head -1 \
      > "/tmp/ab_zstd_${codec}_$i.json"
    python3 - "$codec" "$i" <<'PY' || exit 1
import json, sys
codec, i = sys.argv[1], sys.argv[2]
d = json.load(open(f"/tmp/ab_zstd_{codec}_{i}.json"))
stamp = d.get("codec")
if stamp != codec:
    sys.exit(f"ABORT: leg requested {codec} but the session ran "
             f"{stamp!r} — the codec knob is dead again")
print(f"{codec} run {i}: {d['value']} (codec stamp verified)")
PY
  done
done
python3 - "$ROUNDS" <<'EOF'
import json
import sys
rounds = int(sys.argv[1])


def best(codec):
    runs = [json.load(open(f"/tmp/ab_zstd_{codec}_{i}.json"))
            for i in range(1, rounds + 1)]
    per_q = {q: min(r["queries"][q] for r in runs)
             for q in runs[0]["queries"]}
    return per_q, min(r["value"] for r in runs)


z, zt = best("zstd")
l, lt = best("lz4")
tot_z, tot_l = sum(z.values()), sum(l.values())
print(f"\nper-codec min-fold totals: zstd {tot_z:.1f}s vs lz4 {tot_l:.1f}s "
      f"({(tot_z - tot_l) / tot_l:+.1%}); single-run totals "
      f"zstd {zt:.1f} lz4 {lt:.1f}")
moved = sorted(((q, l[q], z[q]) for q in z
                if abs(z[q] - l[q]) > 0.3 and
                max(z[q], l[q]) > 1.3 * min(z[q], l[q])),
               key=lambda t: t[1] - t[2])
for q, lv, zv in moved:
    print(f"  {q}: lz4 {lv:.2f}s -> zstd {zv:.2f}s")
if not moved:
    print("no per-query move over the A/B bar (>1.3x and >0.3s)")
EOF
