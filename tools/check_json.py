#!/usr/bin/env python3
"""Run tools/check.py and ALSO write its per-query results as JSON —
the shape of the driver's CORRECTNESS_r{N}.json, for recording
off-cycle correctness runs (e.g. the sf1 scale-step spot check).

Usage: python3 tools/check_json.py <sfDir> <outDir> <jsonOut> [query ...]
"""
import sys, json, re, subprocess, os

def main():
    sf_dir, out_dir, json_out = sys.argv[1], sys.argv[2], sys.argv[3]
    queries = sys.argv[4:]
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "check.py"),
         sf_dir, out_dir] + queries,
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
        json.dump({"sf_dir": sf_dir, "results": results,
                   "pass": sum(1 for r in results.values() if r["pass"]),
                   "fail": sum(1 for r in results.values() if not r["pass"])},
                  f, indent=2, sort_keys=True)
    sys.exit(proc.returncode)

if __name__ == "__main__":
    main()
