#!/usr/bin/env python3
"""Parallel per-query oracle check: N worker subprocesses, each its own
DuckDB with bounded threads+memory; failures collected for a solo
low-thread retry pass (the word-unnest OOM class)."""
import sys, json, os, subprocess, concurrent.futures as cf

sfdir, outdir, workers = sys.argv[1], sys.argv[2], int(sys.argv[3])
threads = sys.argv[4] if len(sys.argv) > 4 else "6"
skip = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else set()
names = [n for n in sorted(json.load(open(os.path.join(outdir, "oracle_sql.json"))))
         if n not in skip]
def run(name, th, mem):
    try:
        r = subprocess.run(
            ["python3", os.path.join(os.path.dirname(__file__), "check_one.py"), sfdir, outdir, name, th, mem],
            capture_output=True, text=True, timeout=5400)
    except subprocess.TimeoutExpired:
        return f"FAIL {name}: timeout"
    line = (r.stdout.strip().splitlines() or [""])[-1]
    if r.returncode != 0 and not line.startswith("FAIL"):
        tail = (r.stdout + r.stderr).strip().splitlines()
        line = f"FAIL {name}: " + (tail[-1][:200] if tail else "?")
    return line
results = {}
with cf.ThreadPoolExecutor(max_workers=workers) as ex:
    futs = {ex.submit(run, n, threads, "24GB"): n for n in names}
    for f in cf.as_completed(futs):
        n = futs[f]
        try: results[n] = f.result()
        except Exception as e: results[n] = f"FAIL {n}: runner {e}"
        print(results[n], flush=True)
fails = [n for n, l in results.items() if not l.startswith("PASS")]
if fails:
    print(f"== retrying {len(fails)} solo low-thread", flush=True)
    for n in sorted(fails):
        results[n] = run(n, "2", "100GB")
        print("retry:", results[n], flush=True)
npass = sum(1 for l in results.values() if l.startswith("PASS"))
print(f"== {npass} pass, {len(results)-npass} fail", flush=True)
