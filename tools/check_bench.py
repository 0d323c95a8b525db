#!/usr/bin/env python3
"""Pre-commit guard: refuse to commit a degraded BENCH_LOCAL.json.

The shipping bench artifact must come from a quiet machine
(env.degraded == false). Degraded runs live in bench_history/ only.
"""
import json, subprocess, sys

staged = subprocess.run(
    ["git", "diff", "--cached", "--name-only"],
    capture_output=True, text=True).stdout.split()
if "BENCH_LOCAL.json" not in staged:
    sys.exit(0)
try:
    blob = subprocess.run(
        ["git", "show", ":BENCH_LOCAL.json"],
        capture_output=True, text=True, check=True).stdout
    d = json.loads(blob)
except Exception as e:
    print(f"check_bench: cannot parse staged BENCH_LOCAL.json: {e}")
    sys.exit(1)
env = d.get("env", {})
if env.get("degraded", False):
    print("check_bench: REFUSING commit — staged BENCH_LOCAL.json is a "
          f"degraded run (load_avg_start={env.get('load_avg_start')}). "
          "Re-run the bench on a quiet machine or restore the last quiet "
          "artifact from bench_history/.")
    sys.exit(1)
sys.exit(0)
