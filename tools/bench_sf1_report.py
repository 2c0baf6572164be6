#!/usr/bin/env python3
"""Build BENCH_SF1.json (round-13 verdict #1): merge the sf1.0 full-catalog
bench record with the same-build sf0.1 record and attach per-gate
sf1/sf0.1 scaling ratios.

Inputs are the per-gate TSVs Bench writes next to each record
(name\tvalue, one gate per line — the same channel the family parent
parses), so this never regex-scrapes a JSON line.

Usage: python3 tools/bench_sf1_report.py <sf1.tsv[,sf1b.tsv,...]> <sf01.tsv[,...]> [out]

Each side takes one or more record TSVs; per-gate MINIMA across a
side's records form that side's value (the host is noisy — single runs
jitter; see SCALE.md). The ratio denominator is the SAME BUILD's sf0.1
record(s), not a prior round's, so ratios measure data scaling only.
Gates above RATIO_FLAG get listed in "movers" for the SCALE.md
attribution table (data grows 10x; a gate whose wall grows >15x is
super-linear and needs a written cause). A gate is "failed" only if it
failed in EVERY record on the sf1 side.
"""
import sys, json

RATIO_FLAG = 15.0


def read_tsv(paths):
    out = {}
    for path in paths.split(","):
        for ln in open(path):
            ln = ln.strip()
            if not ln:
                continue
            k, v = ln.split("\t")
            cur = None if v == "null" else float(v)
            if k not in out or out[k] is None:
                out[k] = cur
            elif cur is not None:
                out[k] = min(out[k], cur)
    return out


def main(sf1_tsv, sf01_tsv, out_path="BENCH_SF1.json"):
    sf1, sf01 = read_tsv(sf1_tsv), read_tsv(sf01_tsv)
    # gate-set completeness must hold in BOTH directions (round-14 advice
    # #4): an sf1 gate with no sf0.1 denominator would get no ratio and
    # silently escape the movers screening while still counting in totals
    missing = set(sf01) - set(sf1)
    if missing:
        sys.exit(f"sf1 record lacks gates present at sf0.1: {sorted(missing)}")
    unscreened = sorted(set(sf1) - set(sf01))
    if unscreened:
        sys.exit(f"sf0.1 record lacks gates present at sf1 (no ratio "
                 f"denominator, would escape movers screening): {unscreened}")
    queries, movers, failed = {}, [], []
    for k in sorted(sf1):
        v1, v01 = sf1[k], sf01.get(k)
        if v1 is None:
            failed.append(k)
        entry = {"sf1_sec": v1, "sf01_sec": v01}
        if v1 is not None and v01:
            entry["ratio"] = round(v1 / v01, 2)
            if entry["ratio"] > RATIO_FLAG:
                movers.append(k)
        queries[k] = entry
    rec = {
        "sf": "sf1.0 (10x sf0.1; graft.ScaleData copies=10)",
        "protocol": "family-JVM min-of-3, sf0.001 warmup, cpus=32, 48g "
                    "(BASELINE.md driver protocol; ratio denominator is the "
                    "same-build sf0.1 record)",
        "records": {"sf1": sf1_tsv.split(","), "sf01": sf01_tsv.split(",")},
        "n": len(queries), "n_failed": len(failed), "failed": failed,
        "total_sf1_sec": round(sum(v for v in sf1.values() if v), 1),
        "total_sf01_sec": round(sum(v for v in sf01.values() if v), 1),
        "ratio_flag": RATIO_FLAG,
        "movers_over_flag": movers,
        "queries": queries,
    }
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"{out_path}: {len(queries)} gates, {len(failed)} failed, "
          f"total sf1 {rec['total_sf1_sec']}s vs sf0.1 "
          f"{rec['total_sf01_sec']}s, {len(movers)} gates over "
          f"{RATIO_FLAG}x: {movers}")


if __name__ == "__main__":
    main(*sys.argv[1:])
