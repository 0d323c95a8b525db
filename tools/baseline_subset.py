#!/usr/bin/env python3
"""DuckDB baseline times for a SUBSET of oracle queries with a
per-query wall cap — for large SFs where a handful of oracles are
infeasible on one node (recursive CTEs, >RAM spills) and the point of
the comparison is the queries both engines can actually run.

Usage: baseline_subset.py <sfDir> <verifyOutDir> <capSeconds> <q1,q2,...>
Prints one JSON line {query: seconds | "timeout"}.

Runs each query in a fresh subprocess so a cap kill cannot corrupt the
shared connection, and spills to a scratch dir it wipes afterwards.
"""
import sys, json, time, subprocess, pathlib, tempfile, shutil

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

WORKER = r'''
import sys, json, time, duckdb
sf_dir, sql = sys.argv[1], sys.stdin.read()
con = duckdb.connect()
for t in %s:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
t0 = time.time()
con.sql(sql).fetchall()
print(json.dumps(time.time() - t0))
''' % TABLES


def main(sf_dir, out_dir, cap, names):
    oracle = json.loads((pathlib.Path(out_dir) / "oracle_sql.json").read_text())
    times = {}
    for name in names:
        scratch = tempfile.mkdtemp(prefix="bsub-")
        try:
            p = subprocess.run(
                [sys.executable, "-c", WORKER, sf_dir],
                input=oracle[name], capture_output=True, text=True,
                timeout=cap, cwd=scratch)
            if p.returncode == 0:
                # last stdout line is the timing; anything before it is
                # engine chatter
                times[name] = round(json.loads(
                    p.stdout.strip().splitlines()[-1]), 3)
            else:
                times[name] = f"error: {p.stderr.strip()[:120]}"
        except subprocess.TimeoutExpired:
            times[name] = "timeout"
        except Exception as e:  # keep the sweep alive past one bad query
            times[name] = f"error: {e}"
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
        print(f"  {name}: {times[name]}", file=sys.stderr)
    print(json.dumps(times))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]), sys.argv[4].split(","))
