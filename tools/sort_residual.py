#!/usr/bin/env python3
"""Sort-residual report: ordered-action sweep vs the fullEval baseline.

ordered executes the query's own plan root (final presentation ORDER BY
included, no hash fold); fullEval hashes every column under an
order-insensitive fold (sort eliminated). Per query,
  delta = ordered - fullEval_median ~= sort cost - hash-fold cost,
so positive deltas bound the presentation-sort residual from above and
small/negative deltas mean the sort is cheaper than the fold (tiny
outputs). The ordered sweep is single-run; judge deltas against the
box's variance band (~0.3 s / 1.3x), not as point estimates.

Usage: tools/sort_residual.py ORDERED_JSON FULLEVAL_JSON [TOP_N]
"""
import json
import sys


def main() -> int:
    ordered = json.load(open(sys.argv[1]))["queries"]
    full = json.load(open(sys.argv[2]))["queries"]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    shared = sorted(set(ordered) & set(full))
    rows = [(q, ordered[q], full[q], ordered[q] - full[q]) for q in shared
            if ordered[q] >= 0 and full[q] >= 0]
    tot_o = sum(r[1] for r in rows)
    tot_f = sum(r[2] for r in rows)
    print(f"shared {len(rows)} queries: ordered {tot_o:.1f}s vs "
          f"fullEval {tot_f:.1f}s (residual {tot_o - tot_f:+.1f}s, "
          f"{100 * (tot_o - tot_f) / tot_f:+.1f}%)")
    print("\n| query | ordered (s) | fullEval (s) | delta (s) |")
    print("|---|---|---|---|")
    for q, o, f, d in sorted(rows, key=lambda r: -r[3])[:top_n]:
        print(f"| {q} | {o:.2f} | {f:.2f} | {d:+.2f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
