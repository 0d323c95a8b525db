#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate: for each query
output written by graft.Verify, run the matching oracle SQL in DuckDB
over the same parquet tables and compare (columns sorted by name, rows
sorted, values stringified with rounding already applied engine-side).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, math
import duckdb
import pyarrow.parquet as pq
import pathlib

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        # engine-side rounding already applied; normalize -0.0 and int-floats
        if val == int(val) and abs(val) < 1e15:
            return str(int(val))
        return repr(val)
    if isinstance(val, bool):
        return str(val).lower()
    return str(val)

def tnorm(t):
    """Arrow type name normalized across producers (Spark parquet
    writes large_string where DuckDB reports string)."""
    s = str(t)
    return {"large_string": "string", "large_utf8": "string",
            "utf8": "string"}.get(s, s)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out

def main(sf_dir, out_dir):
    out = pathlib.Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(out.iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        tbl = pq.read_table(qdir)
        scols = [c.lower() for c in tbl.column_names]
        srows = [tuple(d.values()) for d in tbl.to_pylist()]
        srows = [tuple(r) for r in zip(*[tbl.column(c).to_pylist() for c in tbl.column_names])] if tbl.num_rows else []
        if name not in oracle:
            n_noracle += 1
            print(f"  ~ {name}: rows-only ({tbl.num_rows} rows)")
            continue
        try:
            res = con.sql(oracle[name])
            ocols = [c.lower() for c in res.columns]
            oarrow = con.sql(oracle[name]).arrow()
            orows = res.fetchall()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        # strict type parity (the driver may compare schemas strictly)
        stypes = {c.lower(): tnorm(tbl.schema.field(i).type) for i, c in enumerate(tbl.column_names)}
        otypes = {c.lower(): tnorm(oarrow.schema.field(i).type) for i, c in enumerate(oarrow.column_names)}
        if stypes != otypes:
            diff = {k: (stypes.get(k), otypes.get(k)) for k in set(stypes) | set(otypes)
                    if stypes.get(k) != otypes.get(k)}
            print(f"  ✗ {name}: TYPE mismatch {diff}")
            n_fail += 1
            continue
        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        if sc != oc:
            print(f"  ✗ {name}: SCHEMA mismatch spark={sc} oracle={oc}")
            n_fail += 1
        elif sr != orr:
            n_fail += 1
            print(f"  ✗ {name}: VALUE mismatch ({len(sr)} vs {len(orr)} rows)")
            for a, b in list(zip(sr, orr))[:200]:
                if a != b:
                    print(f"      spark={a}\n      duck ={b}")
                    break
            if len(sr) != len(orr):
                sa, sb = set(sr), set(orr)
                only_s = list(sa - sb)[:2]
                only_o = list(sb - sa)[:2]
                print(f"      only-spark={only_s}\n      only-duck ={only_o}")
        else:
            n_pass += 1
            print(f"  ✓ {name} ({len(sr)} rows)")
    print(f"PASS={n_pass} FAIL={n_fail} ROWS_ONLY={n_noracle}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
