#!/usr/bin/env python3
"""Assemble STRESS_r14.json from the round's committed artifacts:
sf0.1 walls from the shipping bench (BENCH_LOCAL.json), sf1 walls +
DuckDB sf1 oracle walls from BENCH_SF1_FULL.json. Rows = the r14
tranche (new capabilities + replanned queries + the measured-decision
rows). floor:true marks documented job-floor rows (incl. ann_cluster_exemplars: 0.76 s sub-second multi-job wall against the r14 fair list-kernel oracle at 0.25 s) (multi-job Spark
walls against embedded oracles measured in milliseconds-to-
sub-second on data too small for parallelism to pay)."""
import json, pathlib

ROWS = [
    # (key, floor)
    ("dd_suffix_spans", False),
    ("dd_suffix_source", False),
    ("dd_split_leakage", False),
    ("ann_proto_prune", False),
    ("pipeline_rank_ensemble", False),
    ("ann_graph_cells", False),
    ("pipeline_snapshot_diff", False),
    ("tx_bm25_search", False),
    ("tx_ndcg_eval", False),
    ("ann_cluster_exemplars", True),
    ("dd_semantic", False),
    ("ann_graph_search", False),
    ("ann_lsh_planted", False),
    ("q_merge_upsert", True),
    ("ann_binary_hamming", True),
    ("q7_nation_volume", False),
]

repo = pathlib.Path("/root/repo")
local = json.loads((repo / "BENCH_LOCAL.json").read_text())
sf1 = json.loads((repo / "BENCH_SF1_FULL.json").read_text())
duck = sf1["duckdb"]["queries"]

rows = {}
worst = (None, 0.0, False)
worst_nonfloor = (None, 0.0)
sublinear = True
for key, floor in ROWS:
    r = {}
    s01 = local["queries"].get(key)
    s1 = sf1["queries"].get(key)
    d1 = duck.get(key)
    if s01 is not None:
        r["sf0.1_s"] = round(s01, 3)
    if s1 is not None:
        r["sf1_s"] = round(s1, 3)
    if s01 and s1:
        sc = s1 / s01
        r["scale_x_wall_for_10x_data"] = round(sc, 2)
        if sc > 10:
            sublinear = False
    if d1 and s1:
        r["duckdb_sf1_s"] = round(d1, 3)
        ratio = s1 / d1
        r["vs_duckdb_sf1"] = round(ratio, 3)
        if floor:
            r["floor"] = True
        if ratio > worst[1]:
            worst = (key, ratio, floor)
        if not floor and ratio > worst_nonfloor[1]:
            worst_nonfloor = (key, ratio)
    rows[key] = r

payload = {
    "note": ("round-14 tranche + replanned rows: sf0.1 walls from the "
             "quiet shipping bench (min-of-4), sf1 walls from the quiet "
             "BENCH_SF1_FULL sweep (min-of-2), DuckDB sf1 oracle walls "
             "cold single-run from BASELINE_TIMES_sf1. floor:true marks "
             "the documented job-floor class. All rows hash-green at "
             "sf0.001/0.01/0.1/1 before timing."),
    "worst_vs_duckdb_sf1": {"key": worst[0], "ratio": round(worst[1], 3),
                            "floor": worst[2]},
    "worst_nonfloor_vs_duckdb_sf1": {"key": worst_nonfloor[0],
                                     "ratio": round(worst_nonfloor[1], 3)},
    "all_sublinear_for_10x_data": sublinear,
    "rows": rows,
}
(repo / "STRESS_r14.json").write_text(json.dumps(payload, indent=1) + "\n")
print(json.dumps(payload["worst_vs_duckdb_sf1"]), json.dumps(payload["worst_nonfloor_vs_duckdb_sf1"]),
      "sublinear", sublinear)
