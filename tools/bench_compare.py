#!/usr/bin/env python3
"""Compare bench records: per-gate minima across N files per side.

Usage: python3 tools/bench_compare.py A1.json[,A2.json,...] B1.json[,B2.json,...] [ratio_flag]

Side A is the candidate (newer), side B the baseline (older). For every
gate present on both sides, takes the MIN across that side's files (the
host is noisy — see SCALE.md; minima approximate the noise floor), then
prints the shared-gate totals, the overall ratio, and every gate whose
ratio exceeds `ratio_flag` (default 1.5). Exit code 1 if any gate
exceeds 2.0x — the repo's BASELINE.md bar.
"""
import json
import sys


def mins(paths):
    out = {}
    for p in paths.split(","):
        with open(p) as f:
            d = json.load(f)
        q = d.get("queries", d)  # *_mins.json files are bare gate maps
        for k, v in q.items():
            if isinstance(v, (int, float)) and v >= 0:
                out[k] = min(out.get(k, float("inf")), v)
    return out


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    a = mins(sys.argv[1])
    b = mins(sys.argv[2])
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    shared = sorted(set(a) & set(b))
    only_a = sorted(set(a) - set(b))
    only_b = sorted(set(b) - set(a))
    ta = sum(a[k] for k in shared)
    tb = sum(b[k] for k in shared)
    print(f"shared gates: {len(shared)}  A-only: {len(only_a)}  B-only: {len(only_b)}")
    if only_a:
        print(f"  new in A: {', '.join(only_a)}")
    if only_b:
        print(f"  gone in A: {', '.join(only_b)}")
    print(f"total (shared): A={ta:.1f}s  B={tb:.1f}s  ratio={ta / tb:.2f}x")
    worst = sorted(((a[k] / b[k], k) for k in shared if b[k] > 0), reverse=True)
    flagged = [(r, k) for r, k in worst if r > flag]
    for r, k in flagged:
        print(f"  {k}: {b[k]:.2f}s -> {a[k]:.2f}s  ({r:.2f}x)")
    if not flagged:
        print(f"no gate above {flag}x")
    over_bar = [(r, k) for r, k in worst if r > 2.0]
    if over_bar:
        print(f"FAIL: {len(over_bar)} gate(s) above the 2.0x bar")
        sys.exit(1)


if __name__ == "__main__":
    main()
