#!/usr/bin/env python3
"""Freeze the round-14 per-gate bench envelope (round-14 verdict #1).

The cross-round floor used to be the 55-gate round-4 envelope; 125 of the
180 gates had no frozen floor, so a regression in them was only visible
vs the previous round. This freezes per-gate MINIMA across the round-14
records at BOTH scale factors as the going-forward bar:

  sf0.1: tools/bench_last.json.tsv + tools/bench_r14_builder2.json.tsv
  sf1.0: tools/bench_sf1_r14.json.tsv + _r14b + _r14c

Outputs:
  BASELINE_R14.json            judge-facing record (rule + both envelopes)
  tools/baseline_r14_sf01.tsv  machine channel Bench reads (name\tvalue)
  tools/baseline_r14_sf1.tsv

The bar (also written into the record): at the same SF under the family-JVM
min-of-3 protocol, a gate violates the envelope when
  wall > 1.5 x frozen_min  AND  wall - frozen_min > 0.5 s
(the absolute floor suppresses the sub-second family-placement jitter class
 measured across rounds 12-14; see BASELINE.md). Bench flags violations in
its record; gates absent from the envelope (added after r14) are exempt
until the next freeze.
"""
import json, sys

RULE = ("wall > 1.5x frozen_min AND wall - frozen_min > 0.5s, same SF, "
        "family-JVM min-of-3 protocol; new gates exempt until next freeze")


def read_tsv(path):
    out = {}
    for ln in open(path):
        ln = ln.strip()
        if not ln:
            continue
        k, v = ln.split("\t")
        if v == "null":
            continue
        v = float(v)
        if k not in out or v < out[k]:
            out[k] = v
    return out


def merge(paths):
    out = {}
    for p in paths:
        for k, v in read_tsv(p).items():
            if k not in out or v < out[k]:
                out[k] = v
    return out


def main():
    sf01 = merge(["tools/bench_last.json.tsv",
                  "tools/bench_r14_builder2.json.tsv"])
    sf1 = merge(["tools/bench_sf1_r14.json.tsv",
                 "tools/bench_sf1_r14b.json.tsv",
                 "tools/bench_sf1_r14c.json.tsv"])
    for name, env in (("tools/baseline_r14_sf01.tsv", sf01),
                      ("tools/baseline_r14_sf1.tsv", sf1)):
        with open(name, "w") as f:
            for k in sorted(env):
                f.write(f"{k}\t{env[k]:.3f}\n")
    rec = {
        "frozen_at_round": 14,
        "rule": RULE,
        "sources": {
            "sf01": ["tools/bench_last.json.tsv",
                     "tools/bench_r14_builder2.json.tsv"],
            "sf1": ["tools/bench_sf1_r14.json.tsv",
                    "tools/bench_sf1_r14b.json.tsv",
                    "tools/bench_sf1_r14c.json.tsv"],
        },
        "n_sf01": len(sf01), "n_sf1": len(sf1),
        "sf01": {k: round(v, 3) for k, v in sorted(sf01.items())},
        "sf1": {k: round(v, 3) for k, v in sorted(sf1.items())},
    }
    with open("BASELINE_R14.json", "w") as f:
        json.dump(rec, f, indent=1)
    print(f"BASELINE_R14.json: {len(sf01)} sf0.1 gates, {len(sf1)} sf1 gates")


if __name__ == "__main__":
    sys.exit(main())
