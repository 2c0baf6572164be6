#!/usr/bin/env python3
"""Build BENCH_SF10.json (round-14 verdict #2): merge the sf10 curated-gate
bench record(s) with the SAME-BUILD sf1.0 record and attach per-gate
sf10/sf1 scaling ratios (one 10x data step).

Inputs are per-gate TSVs (name\tvalue) Bench writes next to each record.

Usage:
  python3 tools/bench_sf10_report.py <sf10.tsv[,...]> <sf1.tsv[,...]> [out]

Unlike the sf1 report, gate-set equality is NOT required: the sf10 lane
is a CURATED subset (the quadratic-yield lattice joins at 100 stacked
copies emit ~10^10-row results; the excluded gates and the reason are
recorded in SCALE.md). Every sf10 gate MUST have an sf1 denominator,
though — a ratio-less gate would escape the movers screening. Gates whose
ratio exceeds RATIO_FLAG (12x per 10x data, the round-14 verdict's
threshold) are listed in "movers_over_flag" for SCALE.md attribution.
Single-run gates (documented big-output lane) carry "runs": 1 via the
SF10_SINGLE list below and are reported separately.
"""
import sys, json

RATIO_FLAG = 12.0

# The documented big-output single-run lane (SPARK_GRAFT_BENCH_RUNS=1):
# these gates' entries carry "runs": 1 so a single-run wall is never
# read as a min-of-3 protocol number. Everything else is min-of-3.
SF10_SINGLE = {
    "q_spjoin_dwithin", "q_spjoin_contains", "q_spjoin_spt",
    "q_disjoint_global", "q_spjoin_intersects",      # tier-B r15b
    "q_spjoin_3d", "q_range_join", "q_interval_join",  # tier-B2 probe2
}


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


def main(sf10_tsv, sf1_tsv, out_path="BENCH_SF10.json"):
    sf10, sf1 = read_tsv(sf10_tsv), read_tsv(sf1_tsv)
    nodenom = sorted(k for k in sf10 if k not in sf1)
    if nodenom:
        sys.exit(f"sf1 record lacks gates present at sf10 (no ratio "
                 f"denominator, would escape movers screening): {nodenom}")
    queries, movers, failed = {}, [], []
    for k in sorted(sf10):
        v10, v1 = sf10[k], sf1.get(k)
        if v10 is None:
            failed.append(k)
        entry = {"sf10_sec": v10, "sf1_sec": v1}
        if k in SF10_SINGLE:
            entry["runs"] = 1
        if v10 is not None and v1:
            entry["ratio"] = round(v10 / v1, 2)
            if entry["ratio"] > RATIO_FLAG:
                movers.append(k)
        queries[k] = entry
    rec = {
        "sf": "sf10 (100x sf0.1; graft.ScaleData copies=100)",
        "protocol": "curated gate families (see SCALE.md sf10 section for "
                    "the inclusion rule and excluded quadratic-yield "
                    "gates), family-JVM min-of-3 unless noted, sf0.001 "
                    "warmup, cpus=32; ratio denominator is the same-build "
                    "sf1.0 record (one 10x step)",
        "records": {"sf10": sf10_tsv.split(","), "sf1": sf1_tsv.split(",")},
        "n": len(queries), "n_failed": len(failed), "failed": failed,
        "total_sf10_sec": round(sum(v for v in sf10.values() if v), 1),
        "total_sf1_sec_same_gates": round(
            sum(v for k, v in sf1.items() if k in sf10 and v), 1),
        "ratio_flag": RATIO_FLAG,
        "movers_over_flag": movers,
        "queries": queries,
    }
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"{out_path}: {len(queries)} gates, {len(failed)} failed, "
          f"total sf10 {rec['total_sf10_sec']}s vs same-gate sf1 "
          f"{rec['total_sf1_sec_same_gates']}s, movers>{RATIO_FLAG}x: {movers}")


if __name__ == "__main__":
    main(*sys.argv[1:])
