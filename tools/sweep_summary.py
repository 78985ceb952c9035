#!/usr/bin/env python3
"""Collapse a 1000x registry sweep log (+ optional post-sweep chain
log with straggler re-checks) into one final per-query status table.

A query's FINAL status is its LAST OK/FAIL line across the inputs in
order: re-checks override the original sweep row. Output is a summary
line plus a markdown table of non-OK rows (the OK bulk is a count —
the PERF record wants the exceptions, not 140 green rows).

Usage: tools/sweep_summary.py [--hash-only] SWEEP_LOG [CHAIN_LOG ...]

--hash-only keeps only hash-mode OK lines ("(N rows, hash)") — the
1000x protocol's fingerprint. Chain logs can interleave sf0.1
pandas-mode OK lines (step-1 tails), which must not override a 1000x
FAIL for the same query.
"""
import re
import sys

LINE = re.compile(r"^(OK|FAIL)\s+([a-z0-9_]+)[: ]\s*(.*)$")


def classify(detail: str) -> str:
    d = detail.lower()
    if "out of memory" in d or "could not allocate" in d:
        return "oracle OOM (one-box bound)"
    if "no space left" in d:
        return "oracle spill disk-full (one-box bound)"
    if "out of range" in d or "can't be cast" in d:
        return "overflow"
    if "no result dir" in d:
        return "verify errored"
    if "hash" in d and "mismatch" in d:
        return "HASH MISMATCH"
    return detail[:60]


def main() -> int:
    args = sys.argv[1:]
    hash_only = "--hash-only" in args
    if hash_only:
        args = [a for a in args if a != "--hash-only"]
    status = {}
    for path in args:
        try:
            text = open(path).read()
        except OSError as e:
            print(f"warn: {e}", file=sys.stderr)
            continue
        for line in text.splitlines():
            m = LINE.match(line.strip())
            if m:
                st, name, detail = m.groups()
                if hash_only and st == "OK" and "hash" not in detail:
                    continue
                status[name] = (st, detail, path)
    ok = sorted(n for n, (s, _, _) in status.items() if s == "OK")
    bad = sorted(n for n, (s, _, _) in status.items() if s != "OK")
    print(f"queries seen: {len(status)}  OK: {len(ok)}  FAIL: {len(bad)}")
    if bad:
        print("\n| query | final status | detail | source |")
        print("|---|---|---|---|")
        for n in bad:
            st, detail, path = status[n]
            print(f"| {n} | {st} | {classify(detail)} | {path} |")
    return 0 if not bad else 1


if __name__ == "__main__":
    sys.exit(main())
