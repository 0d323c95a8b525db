#!/usr/bin/env python3
"""check.py with a per-query wall cap, for large-SF sweeps where a few
oracles are infeasible on one node (recursive CTEs, >RAM spills).

Each oracle runs in a fresh subprocess (its own DuckDB + spill scratch
dir); the subprocess canonicalizes its result rows exactly like
check.py and the parent compares against the Spark parquet. A cap kill
records `timeout` (a skip, not a failure), matching the round-6/8
sf1-sweep methodology.

Usage: check_capped.py <sfDir> <verifyOutDir> [capSeconds=180] [q1,q2,...]
"""
import sys, json, subprocess, pathlib, tempfile, shutil
import pyarrow.parquet as pq

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from check import canon, norm_rows, tnorm, TABLES  # noqa: E402

WORKER = r'''
import sys, json, pathlib
sys.path.insert(0, sys.argv[2])
from check import canon, TABLES
import duckdb
sf_dir, sql = sys.argv[1], sys.stdin.read()
con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
# ONE execution: types and rows both come off the same arrow table
# (running the statement twice would halve the effective wall cap)
tbl = con.sql(sql).arrow()
cols = [c.lower() for c in tbl.column_names]
types = [str(f.type) for f in tbl.schema]
cells = [tbl.column(c).to_pylist() for c in tbl.column_names]
rows = [[canon(v) for v in r] for r in zip(*cells)] if tbl.num_rows else []
print("\x1e" + json.dumps({"cols": cols, "types": types, "rows": rows}))
'''


def main(sf_dir, out_dir, cap=180, only=None):
    out = pathlib.Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    tools_dir = str(pathlib.Path(__file__).parent)
    n_pass = n_fail = n_skip = n_noracle = 0
    for qdir in sorted(out.iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        if only and name not in only:
            continue
        tbl = pq.read_table(qdir)
        if name not in oracle:
            n_noracle += 1
            print(f"  ~ {name}: rows-only ({tbl.num_rows} rows)")
            continue
        scratch = tempfile.mkdtemp(prefix="ckc-")
        try:
            p = subprocess.run(
                [sys.executable, "-c", WORKER, sf_dir, tools_dir],
                input=oracle[name], capture_output=True, text=True,
                timeout=cap, cwd=scratch)
        except subprocess.TimeoutExpired:
            n_skip += 1
            print(f"  ? {name}: ORACLE TIMEOUT >{cap}s (skip)")
            continue
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
        if p.returncode != 0:
            n_fail += 1
            print(f"  ✗ {name}: ORACLE ERROR: {p.stderr.strip()[:160]}")
            continue
        if "\x1e" not in p.stdout:
            n_fail += 1
            print(f"  ✗ {name}: ORACLE ERROR: no sentinel in worker stdout "
                  f"({p.stdout.strip()[:120]!r})")
            continue
        try:
            payload = json.loads(p.stdout.split("\x1e", 1)[1])
        except (ValueError, KeyError) as e:
            n_fail += 1
            print(f"  ✗ {name}: ORACLE ERROR: malformed payload: {e}")
            continue
        ocols, orows = payload["cols"], [tuple(r) for r in payload["rows"]]
        scols = [c.lower() for c in tbl.column_names]
        srows = [tuple(r) for r in zip(*[tbl.column(c).to_pylist()
                 for c in tbl.column_names])] if tbl.num_rows else []

        stypes = {c.lower(): tnorm(tbl.schema.field(i).type)
                  for i, c in enumerate(tbl.column_names)}
        otypes = {c.lower(): tnorm(t)
                  for c, t in zip(payload["cols"], payload["types"])}
        if stypes != otypes:
            diff = {k: (stypes.get(k), otypes.get(k))
                    for k in set(stypes) | set(otypes)
                    if stypes.get(k) != otypes.get(k)}
            n_fail += 1
            print(f"  ✗ {name}: TYPE mismatch {diff}")
            continue
        sc, sr = norm_rows(scols, srows)
        # oracle rows are already canon()'d strings in the worker; sort
        # them under the same column order
        order = sorted(range(len(ocols)), key=lambda i: ocols[i])
        orr = sorted(tuple(r[i] for i in order) for r in orows)
        oc = sorted(ocols)
        if sc != oc:
            n_fail += 1
            print(f"  ✗ {name}: SCHEMA mismatch spark={sc} oracle={oc}")
        elif sr != orr:
            n_fail += 1
            print(f"  ✗ {name}: VALUE mismatch ({len(sr)} vs {len(orr)} rows)")
            for a, b in list(zip(sr, orr))[:200]:
                if a != b:
                    print(f"      spark={a}\n      duck ={b}")
                    break
        else:
            n_pass += 1
            print(f"  ✓ {name} ({len(sr)} rows)")
    print(f"PASS={n_pass} FAIL={n_fail} SKIP={n_skip} ROWS_ONLY={n_noracle}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 180
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    sys.exit(main(sf_dir, out_dir, cap, only))
