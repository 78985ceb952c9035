#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run each oracle SQL in DuckDB
against the sf parquet tables, compare to the Spark result parquet
written by graft.Verify. Usage: tools/check.py SF_DIR OUT_DIR [name...]
"""
import json
import os
import sys

import duckdb
import numpy as np

# Six oracles use `AS MATERIALIZED` CTEs (DuckDB >= 0.9 syntax; the
# driver environment has 1.0.0). An older interpreter would turn them
# into SYNTAX ERRORS — fail fast with the real cause, not 6 cryptic
# per-query parse failures.
_dv = tuple(int(x) for x in duckdb.__version__.split(".")[:2])
assert _dv >= (0, 9), (
    f"duckdb >= 0.9 required for AS MATERIALIZED oracles, "
    f"found {duckdb.__version__}")

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    # tz-aware vs naive is a parquet-metadata artifact (ScaleGen writes
    # TIMESTAMP_MICROS/UTC, the driver's tables are TIMESTAMP(NANOS) →
    # naive in both engines); compare instants, not dtype flavors
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64") and getattr(
                df[c].dt, "tz", None) is not None:
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
    # Bit-pattern tiebreakers for float columns: value-semantics sorting
    # treats -0.0 == 0.0 and ties NaNs, so a tie group differing only in
    # float bit patterns would order nondeterministically (DuckDB's
    # preserve_insertion_order=false makes oracle-side row order
    # genuinely arbitrary) and flaky-FAIL the bit-strict compare in
    # exactly the -0.0/NaN class it targets. Sorting the tie group by
    # the raw bits makes both frames' orders canonical, so equal
    # MULTISETS (the driver's contract) compare equal.
    keys = list(df.columns)
    bitcols = []
    for c in keys:
        view = {np.dtype("float64"): "int64",
                np.dtype("float32"): "int32"}.get(df[c].dtype)
        if view is not None:
            bc = f"__bits_{c}"
            df[bc] = np.ascontiguousarray(df[c].to_numpy()).view(view)
            bitcols.append(bc)
    df = df.sort_values(by=keys + bitcols).reset_index(drop=True)
    return df.drop(columns=bitcols)


def frames_equal(a, b):
    """Bit-strict frame compare. pandas DataFrame.equals treats
    -0.0 == 0.0 and NaN == NaN — WEAKER than the driver's bitwise
    content hash, which is how a -0.0 defect once shipped as
    'green at 4 SFs'. Float columns compare on raw bit patterns
    (no NaN canonicalization: a false local FAIL is safer than a
    false OK); everything else keeps pandas semantics.
    """
    for c in a.columns:
        x, y = a[c], b[c]
        if x.dtype == np.float64 and y.dtype == np.float64:
            if not (x.to_numpy().view("int64")
                    == y.to_numpy().view("int64")).all():
                return False
        elif x.dtype == np.float32 and y.dtype == np.float32:
            if not (x.to_numpy().view("int32")
                    == y.to_numpy().view("int32")).all():
                return False
        elif not x.equals(y):
            return False
    return True


def selftest():
    """Canary: the checker must fail -0.0 vs +0.0 (what the driver's
    bitwise hash fails) and still pass equal NaN-free frames."""
    import pandas as pd
    neg = pd.DataFrame({"v": [-0.0, 1.5]})
    pos = pd.DataFrame({"v": [0.0, 1.5]})
    assert not frames_equal(neg, pos), "-0.0 vs +0.0 must FAIL"
    assert frames_equal(pos.copy(), pos.copy()), "identical must pass"
    nan = pd.DataFrame({"v": [float("nan")]})
    assert frames_equal(nan.copy(), nan.copy()), \
        "same-bit NaN must pass (same engine, same bits)"
    f32 = pd.DataFrame({"v": np.array([-0.0], dtype=np.float32)})
    g32 = pd.DataFrame({"v": np.array([0.0], dtype=np.float32)})
    assert not frames_equal(f32, g32), "float32 -0.0 vs +0.0 must FAIL"
    # norm()'s bit tiebreaker: the same multiset {−0.0, 0.0} in opposite
    # row orders must normalize to one canonical order and compare
    # equal (pre-tiebreaker this was order-nondeterministic and could
    # flaky-FAIL under preserve_insertion_order=false)
    ab = norm(pd.DataFrame({"k": [1, 1], "v": [0.0, -0.0]}))
    ba = norm(pd.DataFrame({"k": [1, 1], "v": [-0.0, 0.0]}))
    assert frames_equal(ab, ba), "equal multisets must pass after norm"
    assert list(ab.columns) == ["k", "v"], "tiebreaker cols must be dropped"
    print("selftest OK: bit-strict float compare verified")


def connect(sf_dir):
    # Fresh connection per query: one long-lived DuckDB connection
    # accumulates buffers across 100+ comparisons and at 100x-sweep
    # scale eventually fails tiny allocations ("bad allocation") even
    # with free RAM; re-registering the table views is microseconds.
    con = duckdb.connect()
    # Bound the oracle and give it a spill path: an unbounded DuckDB
    # sharing the box with a 25 GB Spark JVM dies with "bad allocation"
    # mid-sweep on 1000x sorts/windows; with a limit + temp_directory
    # those operators spill to disk instead.
    con.execute("SET temp_directory='/tmp/duck_spill.tmp'")
    # Neither compare path depends on result order (norm() sorts the
    # frames; hash mode folds to one order-insensitive row), so let
    # DuckDB drop insertion-order preservation: big CTE pipelines then
    # stream instead of buffering for order, which at 1000x is the
    # difference between finishing and exhausting the spill disk
    # (e2e_ingest_full's oracle needed >60 GB of spill with order
    # preserved).
    con.execute("SET preserve_insertion_order=false")
    # Default sized to coexist with the sweep's ~25 GB Spark JVM;
    # GRAFT_DUCK_MEM lets a standalone re-check of one oracle use the
    # whole box (e.g. mm_resize's ordered string_agg holds 5M group
    # states that DuckDB cannot spill — it needs ~everything once the
    # JVM is gone).
    con.execute(
        f"SET memory_limit='{os.environ.get('GRAFT_DUCK_MEM', '48GB')}'")
    # Slice-digest children run under a reduced thread budget (set via
    # GRAFT_DUCK_THREADS by the parent): one 1/16th slice needs neither
    # 32 threads nor the parent's memory cap, and the proven-good probe
    # shape (fresh process, 8 threads, small cap) is what this recreates.
    th = os.environ.get("GRAFT_DUCK_THREADS")
    if th:
        con.execute(f"SET threads={int(th)}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written (ScaleGen) directory form
            p = os.path.join(p, "*.parquet")
        if os.path.exists(os.path.dirname(p) if "*" in p else p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def hash_compare(con, name, spark_src, oracle_sql, slice_spec=None,
                 sf_dir=None, out_dir=None):
    """Memory-bounded compare for 1000x-scale sweeps: both sides are
    reduced INSIDE DuckDB to (row count, exact HUGEINT sum of per-row
    hashes over the name-sorted column struct) — no pandas
    materialization, so a 500M-row result costs a streamed scan, not
    25 GB of frames. Both hashes come from the SAME engine, so
    engine-specific hash quirks cancel; dtype mismatches still fail
    (DuckDB hash is type-sensitive, same contract as the pandas path's
    dtype-sensitive equals). TIMESTAMP WITH TIME ZONE normalizes to
    naive UTC, mirroring norm().

    slice_spec=(col, n): SLICED ORACLE for results whose oracle holds
    per-group state the single-node engine cannot spill (DuckDB's
    ordered string_agg at 5M groups dies in malloc). The oracle digest
    is computed per slice `WHERE abs(col) % n = k` (slice 0 also takes
    `col IS NULL` rows) and folded across slices — sound because both
    count and sum(hash(row)) are order- and partition-insensitive, and
    the slices partition the output EXACTLY for any integer column:
    abs() keeps negative keys in range (DuckDB's % preserves sign, so a
    signed modulo would silently drop them from every slice) and the
    NULL arm catches what no modulo matches. The win requires
    col to be a group/partition key DuckDB can push below the stateful
    operator (doc_id for the per-document aggregations); a slice on a
    non-pushable column just recomputes the full pipeline n times.
    The Spark side is a plain parquet scan — already streamed, never
    sliced.

    Each oracle slice is digested in a FRESH SUBPROCESS (--digest-part):
    DuckDB allocator damage accumulates per PROCESS, and the observed
    failure shape was exactly "a standalone slice passes in 32 s under
    an 8 GB cap; the same slice inside the long-lived checker process
    dies in malloc". The fold is associative, so summing child (n, h)
    pairs is identical to the in-process loop.
    """
    try:
        sn, sh, scols = digest(con, f"SELECT * FROM {spark_src}")
    except Exception as e:
        return f"FAIL {name}: cannot hash spark result: {e}"
    try:
        if slice_spec is None:
            on, oh, ocols = digest(con, oracle_sql)
        else:
            # Release the spark-digest buffers BEFORE the slice children
            # run: DuckDB holds them resident for the life of the
            # process (it does not return freed blocks to the OS), and
            # a parent sitting on a multi-GB pool shrinks what the box
            # can give each child. close() is idempotent, so the
            # caller's own close() stays safe.
            con.close()
            on, oh, ocols = sliced_oracle_digest(
                name, sf_dir, out_dir, slice_spec)
    except Exception as e:
        return f"FAIL {name}: oracle SQL error: {e}"
    if scols != ocols:
        return f"FAIL {name}: columns {list(scols)} vs {list(ocols)}"
    if sn != on:
        return f"FAIL {name}: rows {sn} vs {on}"
    # sum over zero rows is NULL; the sliced fold seeds 0 — same value
    if (sh or 0) != (oh or 0):
        return f"FAIL {name}: content hash mismatch ({sn} rows)"
    return f"OK   {name} ({sn} rows, hash)"


def digest(con, src_sql):
    """(count, exact HUGEINT sum(hash(row)), column signature) — the
    order- and partition-insensitive fold both engines share."""
    cols = con.sql(f"DESCRIBE SELECT * FROM ({src_sql})").df()
    parts, sig = [], []
    for _, r in sorted(cols.iterrows(), key=lambda t: t[1]["column_name"]):
        c, ty = r["column_name"], str(r["column_type"])
        e = f'"{c}"'
        if "WITH TIME ZONE" in ty:
            # tz-aware vs naive is a parquet-metadata artifact
            # (mirrors norm()); compare instants
            e = f"CAST({e} AT TIME ZONE 'UTC' AS TIMESTAMP)"
            ty = "TIMESTAMP"
        elif ty in ("FLOAT", "DOUBLE"):
            # DuckDB hash() collapses -0.0 onto 0.0 — the exact
            # defect class the r8 keeper-sum lesson is about. The
            # VARCHAR rendering is bit-strict for the cases that
            # matter ('-0.0' != '0.0', 'nan' prints), and both
            # sides render in the SAME engine so the shortest-
            # roundtrip form is identical iff the bits are.
            e = f"CAST({e} AS VARCHAR)"
        parts.append(e)
        sig.append((c, ty))
    row = ", ".join(parts)
    # sum, not bit_xor: xor cancels rows with even multiplicity, so
    # equal-count results whose differing rows pair up would pass.
    # sum(UBIGINT) is exact HUGEINT in DuckDB — same streamed cost,
    # no blind spot.
    q = (f"SELECT count(*) AS n, sum(hash(ROW({row}))) AS h "
         f"FROM ({src_sql})")
    n, h = con.sql(q).fetchone()
    return int(n), h, tuple(sig)


def sliced_oracle_digest(name, sf_dir, out_dir, slice_spec):
    """Fold the oracle digest over `WHERE col % n = k` slices, one
    FRESH child process per slice (see hash_compare's docstring for
    why in-process looping is unsound on this allocator). Children run
    under a reduced budget — GRAFT_DUCK_SLICE_MEM (default 24GB) and
    GRAFT_DUCK_SLICE_THREADS (default 8) — the probe-proven shape."""
    import subprocess
    col, nslices = slice_spec
    env = dict(
        os.environ,
        GRAFT_DUCK_MEM=os.environ.get("GRAFT_DUCK_SLICE_MEM", "24GB"),
        GRAFT_DUCK_THREADS=os.environ.get("GRAFT_DUCK_SLICE_THREADS", "8"))
    # Slice sizes are data-dependent (doc_id group skew): one slice of
    # the same query can need 3x another's memory. Retry a failed slice
    # once at the big cap before declaring the oracle bound.
    retry_env = dict(env, GRAFT_DUCK_MEM=os.environ.get(
        "GRAFT_DUCK_SLICE_MEM_RETRY", "64GB"))
    on, oh, ocols = 0, 0, None
    for k in range(nslices):
        cmd = [sys.executable, os.path.abspath(__file__), "--hash",
               f"--slice={col}:{nslices}", f"--digest-part={k}",
               sf_dir, out_dir, name]
        r = subprocess.run(cmd, capture_output=True, text=True, env=env)
        if r.returncode != 0:
            print(f"  [slice {k + 1}/{nslices}] {name}: retrying at "
                  f"{retry_env['GRAFT_DUCK_MEM']}", file=sys.stderr,
                  flush=True)
            r = subprocess.run(cmd, capture_output=True, text=True,
                               env=retry_env)
        lines = [ln for ln in r.stdout.splitlines()
                 if ln.startswith("DIGEST ")]
        if r.returncode != 0 or not lines:
            tail = (r.stderr or "").strip().splitlines()[-1:]
            raise RuntimeError(
                f"slice {k} child rc={r.returncode}: {tail}")
        obj = json.loads(lines[-1][len("DIGEST "):])
        on += obj["n"]
        oh += int(obj["h"]) if obj["h"] is not None else 0
        ocols = tuple((c, t) for c, t in obj["sig"])
        print(f"  [slice {k + 1}/{nslices}] {name}: {obj['n']} rows",
              file=sys.stderr, flush=True)
    return on, oh, ocols


def digest_part(sf_dir, out_dir, name, slice_spec, part):
    """Child mode (--digest-part=K): digest ONE oracle slice in this
    fresh process and emit a machine-readable line for the parent."""
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle_sql = json.load(f)[name]
    col, nslices = slice_spec
    con = connect(sf_dir)
    # abs() + a NULL arm on slice 0 make the slices a true partition of
    # ANY integer column (signed % would route negative keys to no
    # slice and NULLs match no modulo — either would surface as a
    # confusing row-count FAIL).
    cond = f'abs("{col}") % {nslices} = {part}'
    if part == 0:
        cond = f'("{col}" IS NULL OR {cond})'
    n, h, sig = digest(con, f'SELECT * FROM ({oracle_sql}) WHERE {cond}')
    print("DIGEST " + json.dumps(
        {"n": n, "h": str(h) if h is not None else None,
         "sig": [list(p) for p in sig]}), flush=True)


def main():
    if sys.argv[1:] == ["--selftest"]:
        selftest()
        return
    args = sys.argv[1:]
    hash_mode = "--hash" in args
    if hash_mode:
        args.remove("--hash")
    # --slice=COL:N — sliced oracle digest (hash mode only), applied to
    # every named query; see hash_compare's docstring.
    slice_spec = None
    for a in [a for a in args if a.startswith("--slice=")]:
        args.remove(a)
        col, n = a[len("--slice="):].rsplit(":", 1)
        slice_spec = (col, int(n))
    part = None
    for a in [a for a in args if a.startswith("--digest-part=")]:
        args.remove(a)
        part = int(a[len("--digest-part="):])
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    if part is not None:
        digest_part(sf_dir, out_dir, sorted(only)[0], slice_spec, part)
        return
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    if hash_mode and len(only) != 1:
        # Process-per-query: DuckDB allocations accumulate PER PROCESS
        # (a fresh connection does not return them — observed live as a
        # fresh connect() failing a 765-byte allocation after four
        # 5M-row hashes in one process), and one query's OOM must not
        # silence the rest of the batch's report. Re-invoke ourselves
        # once per query; each child prints its own OK/FAIL line.
        import subprocess
        names = sorted(n for n in set(oracles) | {
            d for d in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, d))}
            if not only or n in only)
        fails = 0
        for n in names:
            cmd = [sys.executable, os.path.abspath(__file__), "--hash"]
            if slice_spec is not None:
                cmd.append(f"--slice={slice_spec[0]}:{slice_spec[1]}")
            r = subprocess.run(cmd + [sf_dir, out_dir, n],
                               capture_output=True, text=True)
            body = [ln for ln in r.stdout.splitlines()
                    if ln.startswith(("OK", "FAIL", "SKIP"))]
            for ln in body:
                print(ln, flush=True)
            if r.returncode != 0:
                fails += 1
                if not any(ln.startswith("FAIL") for ln in body):
                    # child died without reporting (hard OOM/kill)
                    print(f"FAIL {n}: checker exited rc={r.returncode}: "
                          f"{(r.stderr or '').strip().splitlines()[-1:]}",
                          flush=True)
        print(f"\n{len(names) - fails} ok, {fails} fail")
        sys.exit(1 if fails else 0)
    ok = fail = 0
    for name in oracles:
        if only and name not in only:
            continue
        if not os.path.isdir(os.path.join(out_dir, name)):
            print(f"FAIL {name}: no result dir (query errored in Verify?)")
            fail += 1
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or (only and name not in only):
            continue
        if hash_mode:
            con = connect(sf_dir)
            if name not in oracles:
                try:
                    n = con.sql(
                        f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
                    print(f"SKIP {name}: no oracle ({n} rows)")
                except Exception as e:
                    print(f"FAIL {name}: cannot read spark result: {e}")
                    fail += 1
                con.close()
                continue
            msg = hash_compare(con, name, f"'{d}/*.parquet'",
                               oracles[name], slice_spec,
                               sf_dir=sf_dir, out_dir=out_dir)
            con.close()
            print(msg)
            if msg.startswith("OK"):
                ok += 1
            else:
                fail += 1
            continue
        con = connect(sf_dir)
        try:
            spark_df = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            fail += 1
            con.close()
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(spark_df)} rows)")
            con.close()
            continue
        try:
            duck_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            fail += 1
            con.close()
            continue
        con.close()
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            fail += 1
            continue
        if frames_equal(a, b):
            ok += 1
            print(f"OK   {name} ({len(a)} rows)")
            continue
        # find first differing cells
        diffs = []
        for c in a.columns:
            if a[c].dtype == np.float64 and b[c].dtype == np.float64:
                neq = (a[c].to_numpy().view("int64")
                       != b[c].to_numpy().view("int64"))
            else:
                neq = ((a[c] != b[c]) & ~(a[c].isna() & b[c].isna())
                       ).to_numpy()
            if neq.any():
                i = int(np.argmax(neq))
                diffs.append(f"{c}[{i}]: spark={a[c][i]!r} duck={b[c][i]!r}"
                             f" (dtype {a[c].dtype} vs {b[c].dtype})")
        print(f"FAIL {name}: {'; '.join(diffs[:4])}")
        fail += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
