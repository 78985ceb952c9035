#!/usr/bin/env python3
"""Offline analysis for the round-8 measurement block.

Modes:
  ab      — /tmp/ab_r6_{1,2,3}.json vs /tmp/ab_head_{1,2,3}.json
            (same-session interleaved, both count-action): per-query
            medians on the shared registry, sorted by head/r6 ratio.
  audit   — /tmp/bench_r8_fulleval.json (fullEval medians) vs the
            count-action medians from /tmp/ab_head_*.json: the
            under-timed list (what count() was never charging for).
"""
import json
import statistics
import sys


def med_of(paths):
    runs = []
    for p in paths:
        with open(p) as f:
            runs.append(json.load(f)["queries"])
    keys = set(runs[0])
    for r in runs[1:]:
        keys &= set(r)
    return {k: statistics.median(r[k] for r in runs)
            for k in keys if all(r[k] >= 0 for r in runs)}


def mode_ab():
    r6 = med_of([f"/tmp/ab_r6_{i}.json" for i in (1, 2, 3)])
    hd = med_of([f"/tmp/ab_head_{i}.json" for i in (1, 2, 3)])
    shared = sorted(set(r6) & set(hd))
    rows = [(k, r6[k], hd[k], hd[k] / r6[k] if r6[k] > 0 else 0)
            for k in shared]
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':34s} {'r6':>7s} {'head':>7s} {'head/r6':>8s}")
    for k, a, b, ratio in rows:
        flag = " <<<" if ratio > 1.3 and b - a > 0.3 else ""
        print(f"{k:34s} {a:7.2f} {b:7.2f} {ratio:8.2f}{flag}")
    print(f"\ntotals: r6={sum(r6[k] for k in shared):.1f} "
          f"head={sum(hd[k] for k in shared):.1f} on {len(shared)} shared")


def mode_audit():
    with open("/tmp/bench_r8_fulleval.json") as f:
        fe = json.load(f)["queries"]
    cnt = med_of([f"/tmp/ab_head_{i}.json" for i in (1, 2, 3)])
    shared = sorted(set(fe) & set(cnt))
    rows = [(k, cnt[k], fe[k], fe[k] - cnt[k]) for k in shared]
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':34s} {'count':>7s} {'fullEval':>9s} {'delta':>7s}")
    for k, c, f_, d in rows:
        flag = " UNDER-TIMED" if d > max(0.3, 0.25 * max(c, 0.01)) else ""
        print(f"{k:34s} {c:7.2f} {f_:9.2f} {d:7.2f}{flag}")
    print(f"\ntotals: count={sum(cnt[k] for k in shared):.1f} "
          f"fullEval={sum(fe[k] for k in shared):.1f}")


if __name__ == "__main__":
    {"ab": mode_ab, "audit": mode_audit}[sys.argv[1]]()
