#!/usr/bin/env python3
"""Run tools/check.py and ALSO write its per-query results as JSON —
the shape of the driver's CORRECTNESS_r{N}.json, for recording
off-cycle correctness runs (e.g. the sf1 scale-step spot check).

Usage: python3 tools/check_json.py [--rel] <sfDir> <outDir> <jsonOut> [query ...]

--rel forwards check.py's relative-tolerance float compare (use for
large-SF runs where 1e10-scale double sums differ in the 14th digit
by summation order across engines).
"""
import sys, json, re, subprocess, os

def main():
    args = sys.argv[1:]
    rel = ["--rel"] if "--rel" in args else []
    if rel:
        args.remove("--rel")
    sf_dir, out_dir, json_out = args[0], args[1], args[2]
    queries = args[3:]
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "check.py")]
        + rel + [sf_dir, out_dir] + queries,
        capture_output=True, text=True)
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    results = {}
    for line in proc.stdout.splitlines():
        m = re.match(r"^(\S+)\s+PASS\s+rows=(\d+)", line)
        if m:
            results[m.group(1)] = {"pass": True, "rows": int(m.group(2))}
            continue
        m = re.match(r"^(\S+)\s+(FAIL|NO SPARK OUTPUT|ORACLE ERROR)", line)
        if m:
            results[m.group(1)] = {"pass": False, "detail": line.strip()}
    with open(json_out, "w") as f:
        json.dump({"sf_dir": sf_dir, "rel": bool(rel), "results": results,
                   "pass": sum(1 for r in results.values() if r["pass"]),
                   "fail": sum(1 for r in results.values() if not r["pass"])},
                  f, indent=2, sort_keys=True)
    sys.exit(proc.returncode)

if __name__ == "__main__":
    main()
