#!/bin/bash
# Round-10 1000x phase 2 (runs after the re-affirm sweep frees the box):
#  A. sliced-oracle conversions (r9 ask #2): mm_resize + text_cdc_chunks
#     engine outputs at 1000x vs the DuckDB oracle computed per doc_id
#     slice and folded — converts the two string_agg malloc deaths
#     into true cross-engine passes.
#  B. the three streaming file twins at 1000x (r9 ask #6): the
#     file-source path has no driver replay, so the old harness bound
#     is gone by construction — prove it.
#  C. m4_reorg_flagship at 1000x engine-side (r9 ask #3): the
#     sequentialized fork serves must fit the single-serve (~45 GB)
#     spill class where the co-resident serves (>62 GB) did not.
#     The oracle is the e2e_ingest_full class (full-stream window CTEs,
#     spill-dead at 1000x, r9) — engine digest recorded instead.
# Usage: tools/r10_phase2.sh [A|B|C ...]  (default: A B C)
set -u
cd /root/repo
SF=/tmp/scale1000
OUT=/tmp/r10_phase2_out
CL=/tmp/graft_classes_r10
LOG=/tmp/r10_phase2.log
[ -d "$CL" ] || cp -r target/scala-2.13/classes "$CL"
export GRAFT_CLASSES="$CL"
export SPARK_GRAFT_CPUS=32 SPARK_GRAFT_OUT_PARTS=32
export SPARK_DRIVER_MEM=48g
export GRAFT_DUCK_MEM=72GB
export GRAFT_STREAM_PARTS=32

log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

engine_digest() { # name — count + sum(hash(row)) of the engine output
  python3 - "$OUT/$1" <<'EOF'
import sys, duckdb
con = duckdb.connect()
con.execute("SET memory_limit='48GB'")
con.execute("SET temp_directory='/tmp/duck_spill.tmp'")
cols = con.sql(f"DESCRIBE SELECT * FROM '{sys.argv[1]}/*.parquet'").df()
parts = []
for _, r in sorted(cols.iterrows(), key=lambda t: t[1]["column_name"]):
    c, ty = r["column_name"], str(r["column_type"])
    e = f'"{c}"'
    if ty in ("FLOAT", "DOUBLE"):
        e = f"CAST({e} AS VARCHAR)"
    parts.append(e)
row = ", ".join(parts)
n, h = con.sql(
    f"SELECT count(*), sum(hash(ROW({row}))) "
    f"FROM '{sys.argv[1]}/*.parquet'").fetchone()
print(f"ENGINE-DIGEST {sys.argv[1].rsplit('/',1)[-1]}: n={n} h={h}")
EOF
}

run_verify() { # csv-names timeout-s
  rm -rf "$OUT"
  timeout "$2" env SPARK_GRAFT_ONLY="$1" \
    tools/run_graft.sh graft.Verify "$SF" "$OUT" >> "$LOG.err" 2>&1
  log "verify($1) rc=$?"
}

phaseA() {
  log "=== A: sliced-oracle conversions ==="
  run_verify mm_resize,text_cdc_chunks 7200
  timeout 7200 python3 tools/check.py --hash --slice=doc_id:16 \
    "$SF" "$OUT" mm_resize text_cdc_chunks 2>>"$LOG.err" \
    | grep -E '^(OK|FAIL)' >> "$LOG"
}

phaseB() {
  log "=== B: streaming file twins at 1000x ==="
  run_verify streaming_balances_file,streaming_sessions_file,streaming_txstats_file 10800
  timeout 3600 python3 tools/check.py --hash "$SF" "$OUT" \
    streaming_balances_file streaming_sessions_file \
    streaming_txstats_file 2>>"$LOG.err" \
    | grep -E '^(OK|FAIL)' >> "$LOG"
}

phaseC() {
  log "=== C: m4_reorg_flagship engine-side at 1000x ==="
  run_verify m4_reorg_flagship 10800
  if [ -d "$OUT/m4_reorg_flagship" ]; then
    engine_digest m4_reorg_flagship >> "$LOG" 2>>"$LOG.err"
  else
    log "m4_reorg_flagship: no output dir — engine did NOT complete"
  fi
}

phaseD() {
  # EXPERIMENT: e2e_ingest_full sliced on propertyId. Unlike doc_id
  # slicing (pushes below one GROUP BY), pid%8 prunes whole UNION
  # legs of the flows CTE per slice (most legs carry literal pids),
  # so the union-aggregate peak drops even though the window CTEs
  # re-materialize per slice. If the oracle still dies, the recorded
  # reason is: the spill driver is the full-stream window CTEs, which
  # every slice recomputes — input-shaped, not output-shaped.
  log "=== D: e2e_ingest_full sliced-oracle experiment ==="
  run_verify e2e_ingest_full 7200
  if [ -d "$OUT/e2e_ingest_full" ]; then
    engine_digest e2e_ingest_full >> "$LOG" 2>>"$LOG.err"
    # each slice child recomputes the window CTEs over the full stream:
    # give it most of the idle box (children run one at a time)
    timeout 10800 env GRAFT_DUCK_SLICE_MEM=64GB \
      GRAFT_DUCK_SLICE_THREADS=24 \
      python3 tools/check.py --hash --slice=propertyId:8 \
      "$SF" "$OUT" e2e_ingest_full 2>>"$LOG.err" \
      | grep -E '^(OK|FAIL)' >> "$LOG"
  else
    log "e2e_ingest_full: no output dir — engine did NOT complete"
  fi
}

for ph in "${@:-A B C D}"; do
  case "$ph" in
    A) phaseA ;; B) phaseB ;; C) phaseC ;; D) phaseD ;;
  esac
done
log "=== phase2 done ==="
