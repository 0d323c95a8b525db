#!/usr/bin/env python3
"""Replicate a testdata SF directory N-fold with join-consistent key
shifts, producing a larger-scale dataset for gate/bench runs.

Dimension keys referenced by value (nation/region) stay fixed; every
entity key shifts by rep*stride with the SAME stride on both sides of
each foreign-key edge, so join cardinalities scale linearly and query
semantics survive replication. Strides match tools/ScaleStress.scala
(documents/embeddings/events) so invariants the pipeline queries rely
on (probe sets at low ids, planted-clone offsets) hold in the base
replica and stay disjoint in the others.

Usage: python3 tools/replicate_sf.py <srcSfDir> <dstDir> [factor=10]
"""
import sys
import duckdb

# table -> list of (column, stride) shifts; tables absent here copy as-is
SHIFTS = {
    "customer": [("c_custkey", 10_000_000)],
    "orders": [("o_orderkey", 100_000_000), ("o_custkey", 10_000_000)],
    "lineitem": [("l_orderkey", 100_000_000), ("l_partkey", 10_000_000),
                 ("l_suppkey", 1_000_000)],
    "part": [("p_partkey", 10_000_000)],
    "supplier": [("s_suppkey", 1_000_000)],
    "documents": [("doc_id", 10_000_000)],
    "embeddings": [("vec_id", 10_000_000)],
    "events": [("event_id", 100_000_000), ("user_id", 10_000_000)],
    "region": [],
    "nation": [],
}


def replicate_arrow(src_pq, dst_pq, shifts, factor):
    """pyarrow replication path for tables with timestamp[ns] columns:
    DuckDB 1.x reads parquet NANOS as TIMESTAMP (micros), silently
    truncating — the engine's nanos-as-long read would then see a
    different physical type AND different values."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyarrow.compute as pc
    t = pq.read_table(src_pq)
    cols = dict(shifts)
    reps = []
    for rep in range(factor):
        r = t
        for name, stride in cols.items():
            i = r.schema.get_field_index(name)
            shifted = pc.add(r.column(name), pa.scalar(rep * stride,
                                                       r.schema.field(i).type))
            r = r.set_column(i, r.schema.field(i), shifted)
        reps.append(r)
    out = pa.concat_tables(reps)
    pq.write_table(out, dst_pq, use_deprecated_int96_timestamps=False,
                   coerce_timestamps=None)
    return out.num_rows


def main(src, dst, factor):
    import pathlib
    import pyarrow.parquet as pq
    pathlib.Path(dst).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for table, shifts in SHIFTS.items():
        src_pq = f"{src}/{table}.parquet"
        dst_pq = f"{dst}/{table}.parquet"
        if shifts and any(str(f.type).startswith("timestamp[ns")
                          for f in pq.read_schema(src_pq)):
            n = replicate_arrow(src_pq, dst_pq, shifts, factor)
            print(f"  {table}: {n} rows (pyarrow, ns-preserving)")
            continue
        if not shifts:
            con.sql(f"COPY (SELECT * FROM '{src_pq}') TO '{dst_pq}' (FORMAT PARQUET)")
            continue
        # keep each shifted column's ORIGINAL type: a silent int->bigint
        # widening would flip schema-match in the correctness gate
        cols = dict(shifts)
        desc = con.sql(f"DESCRIBE SELECT * FROM '{src_pq}'").fetchall()
        sel = ", ".join(
            f"CAST(t.{name} + r.rep * {cols[name]} AS {typ}) AS {name}"
            if name in cols else f"t.{name}" for name, typ, *_ in desc)
        con.sql(
            f"COPY (SELECT {sel} FROM '{src_pq}' t "
            f"CROSS JOIN (SELECT UNNEST(RANGE({factor})) AS rep) r) "
            f"TO '{dst_pq}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst_pq}'").fetchone()[0]
        print(f"  {table}: {n} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)
