#!/usr/bin/env python3
"""Pre-commit guard for the shipping bench artifact (BENCH_LOCAL.json).

Two rules (r10 + r13 verdict items):

1. A STAGED BENCH_LOCAL.json must come from a quiet machine
   (env.degraded == false). Degraded runs live in bench_history/ only.

2. The WORKING-TREE BENCH_LOCAL.json must not be dirty (differ from
   the staged/HEAD content without being staged) at commit time — the
   r10/r12 blemish was rounds ending with a degraded driver re-run
   sitting on top of the committed quiet artifact. Iterating on perf?
   Point intermediate runs elsewhere: SPARK_GRAFT_BENCH_OUT=/tmp/b.json.
   Emergency escape hatch: GRAFT_ALLOW_DIRTY_BENCH=1.
"""
import json, os, subprocess, sys


def run(args):
    return subprocess.run(args, capture_output=True, text=True)


staged = run(["git", "diff", "--cached", "--name-only"]).stdout.split()

# Rule 2: refuse any commit while the tree's BENCH_LOCAL differs from
# what this commit would record (staged version if staged, else HEAD).
if os.environ.get("GRAFT_ALLOW_DIRTY_BENCH") != "1":
    dirty = run(["git", "status", "--porcelain", "--", "BENCH_LOCAL.json"]).stdout
    # " M" = modified unstaged, "MM" = staged AND re-modified, "??" = untracked
    unstaged_dirty = any(
        line and (line[1] == "M" or line.startswith("??"))
        for line in dirty.splitlines())
    if unstaged_dirty:
        print("check_bench: REFUSING commit — working-tree BENCH_LOCAL.json "
              "differs from the version this commit records (unstaged or "
              "untracked). Either stage a quiet artifact, or restore the "
              "committed one (git checkout -- BENCH_LOCAL.json). For "
              "intermediate perf runs use SPARK_GRAFT_BENCH_OUT=/tmp/b.json; "
              "override once with GRAFT_ALLOW_DIRTY_BENCH=1.")
        sys.exit(1)

# Rule 1: staged artifact must be a quiet run.
if "BENCH_LOCAL.json" not in staged:
    sys.exit(0)
try:
    blob = run(["git", "show", ":BENCH_LOCAL.json"]).stdout
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
