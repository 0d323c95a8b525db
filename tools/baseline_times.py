#!/usr/bin/env python3
"""Measure reference-equivalent (DuckDB) wall-times for every oracle
query, producing the baseline side of the bench comparison.

DuckDB runs each `oracleSql` statement — the exact SQL the correctness
gate validates against — over the same parquet tables, so the recorded
seconds are an apples-to-apples single-node baseline for the queries
the engine claims. Min of `runs` timed executions after one warmup.

Usage: python3 tools/baseline_times.py <sfDir> <verifyOutDir> [runs]
Writes: BASELINE_TIMES_<sfName>.json
"""
import sys, json, time, pathlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, runs=2, timeout=None):
    sf_name = pathlib.Path(sf_dir).name
    oracle = json.loads((pathlib.Path(out_dir) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    times = {}
    timeouts = []
    import threading
    for name in sorted(oracle):
        sql = oracle[name]
        # per-query watchdog (opt-in): a quadratic/recursive oracle at a
        # big SF must record "timeout" and move on, not hang the sweep —
        # duckdb's interrupt() aborts the running statement. Two layers
        # close the stale-interrupt races (r15 advice): the timer's
        # check-and-interrupt and the done-flag set hold ONE lock, so
        # the timer can never interrupt after completion was flagged;
        # and each query runs on its OWN cursor, so an interrupt that
        # still lands post-completion (fired between the statement
        # finishing inside duckdb and the flag set) dies with the
        # cursor instead of aborting the next query.
        cur = con.cursor()
        killer = None
        done = []
        guard = threading.Lock()

        def maybe_interrupt(c=cur, d=done, g=guard):
            with g:
                if not d:
                    c.interrupt()

        if timeout:
            killer = threading.Timer(timeout, maybe_interrupt)
            killer.start()
        try:
            # runs=0: one cold timed execution, no warmup — for large
            # SFs where the multi-minute recursive-CTE oracles would
            # otherwise run twice for a number that is minutes either way
            if runs <= 0:
                best = _timed(cur, sql)
            else:
                cur.sql(sql).fetchall()  # warmup (I/O cache, plan)
                best = min(
                    _timed(cur, sql) for _ in range(runs))
            with guard:
                done.append(True)  # under the lock: no late interrupt
            times[name] = round(best, 4)
            print(f"  {name}: {times[name]}s")
        except Exception as e:  # noqa: BLE001 - record and continue
            if "INTERRUPT" in str(e).upper():
                timeouts.append(name)
                print(f"  {name}: TIMEOUT >{timeout}s")
            else:
                print(f"  {name}: FAILED {e}")
        finally:
            with guard:
                done.append(True)
            if killer:
                killer.cancel()
            cur.close()
    payload = {
        "engine": "duckdb",
        "sf": sf_name,
        "total": round(sum(times.values()), 4),
        "queries": times,
    }
    if timeouts:
        payload["timeouts"] = {"limit_s": timeout, "queries": sorted(timeouts)}
    out = pathlib.Path(f"BASELINE_TIMES_{sf_name}.json")
    out.write_text(json.dumps(payload) + "\n")
    print(f"wrote {out}: total={payload['total']}s over {len(times)} queries")


def _timed(con, sql):
    t0 = time.perf_counter()
    con.sql(sql).fetchall()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 2,
         int(sys.argv[4]) if len(sys.argv) > 4 else None)
