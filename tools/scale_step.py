#!/usr/bin/env python3
"""Compose BENCH_scale_step.json from two BENCH_full.json records.

Usage: scale_step.py <sf01_full.json> <sf1_full.json> [note]

Per-query step ratio = sf1_sec / sf01_sec over queries present in both
records (shared_build excluded: it is an attribution line, not a query).
"superlinear" = ratio > step_x (work grew faster than data).
"""
import json, statistics, sys

def load(p):
    with open(p) as f:
        return json.loads(f.readline())

def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    note = sys.argv[3] if len(sys.argv) > 3 else ""
    step = 10
    qa, qb = a["queries"], b["queries"]
    keys = [k for k in qa if k in qb and k != "shared_build"
            and qa[k] > 0 and qb[k] > 0]
    ratios = {k: qb[k] / qa[k] for k in keys}
    worst = sorted(ratios, key=ratios.get, reverse=True)[:5]
    rec = {
        "scale_factor_step": step,
        "sf01_total_sec": round(a["value"], 1),
        "sf1_total_sec": round(b["value"], 1),
        "n_queries": len(keys),
        "failed": len(a.get("failed", [])) + len(b.get("failed", [])),
        "ratio_median": round(statistics.median(ratios.values()), 2),
        "ratio_max": round(max(ratios.values()), 2),
        "superlinear_queries": sorted(k for k in keys if ratios[k] > step),
        "worst5": [{"q": k, "sf01_sec": round(qa[k], 2),
                    "sf1_sec": round(qb[k], 2), "x": round(ratios[k], 2)}
                   for k in worst],
        "note": note,
    }
    print(json.dumps(rec, indent=2))

if __name__ == "__main__":
    main()
