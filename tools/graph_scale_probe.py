#!/usr/bin/env python3
"""Scaled-graph oracle probe (dev tool, driver-side python only).

Builds an "sf1-shaped" lineitem (N disjoint shifted copies of the
sf0.1 table) under /tmp, then times the DuckDB oracle SQL of the four
iterative graph queries against sf0.001/sf0.01/sf0.1/scaled — the
DuckDB half of the per-query scaling rows VERDICT r8 asked for
(the Spark half comes from Bench with SPARK_GRAFT_SF_DIR pointed at
the same dirs). Disjoint copies keep the per-copy structure identical,
so engine work scales with data on both sides and the slopes are
comparable.

Usage: python3 tools/graph_scale_probe.py <verifyOutDir> [copies]
  <verifyOutDir> must contain oracle_sql.json (written by graft.Verify).
"""
import json
import os
import sys
import time

import duckdb

QUERIES = ["graph_triangles_parts", "graph_bfs_hops",
           "graph_coreness_parts", "graph_label_prop_parts",
           "graph_pagerank_parts", "graph_ppr_parts",
           "graph_degree_powerlaw"]

ORDER_SHIFT = 10_000_000
PART_SHIFT = 1_000_000


def build_scaled(src_dir: str, out_dir: str, copies: int) -> str:
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "lineitem.parquet")
    if not os.path.exists(out):
        con = duckdb.connect()
        parts = " UNION ALL ".join(
            f"SELECT l_orderkey + {i * ORDER_SHIFT} AS l_orderkey, "
            f"l_partkey + {i * PART_SHIFT} AS l_partkey, * EXCLUDE "
            f"(l_orderkey, l_partkey) FROM "
            f"read_parquet('{src_dir}/lineitem.parquet')"
            for i in range(copies))
        con.execute(f"COPY ({parts}) TO '{out}' (FORMAT PARQUET)")
        con.close()
    return out


def time_oracles(lineitem_path: str, oracle_sql: dict, threads: int = 32,
                 label: str = ""):
    rows = {}
    for q in QUERIES:
        sql = oracle_sql[q]
        con = duckdb.connect()
        con.execute(f"SET threads={threads}")
        # bounded spill: the x10 pagerank/ppr unrolled CTEs spilled
        # >79 GB and filled the disk (r10) — cap and record DNF
        # instead; an oracle that cannot finish at the scaled shape
        # IS the scaling datum
        con.execute("SET memory_limit='80GB'")
        con.execute("SET temp_directory='/tmp/duckdb_probe_tmp'")
        con.execute("SET max_temp_directory_size='40GB'")
        con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                    f"read_parquet('{lineitem_path}')")
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            rows[q] = round(time.time() - t0, 3)
        except Exception as ex:
            rows[q] = f"DNF after {round(time.time() - t0, 1)}s: " \
                      f"{type(ex).__name__}"
        print(f"  [{label}] {q}: {rows[q]}", flush=True)
        con.close()
    return rows


def main():
    verify_dir = sys.argv[1]
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    with open(os.path.join(verify_dir, "oracle_sql.json")) as f:
        oracle_sql = json.load(f)
    results = {}
    for label, path in [("sf0.001", "/root/testdata/sf0.001"),
                        ("sf0.01", "/root/testdata/sf0.01"),
                        ("sf0.1", "/root/testdata/sf0.1")]:
        results[label] = time_oracles(
            os.path.join(path, "lineitem.parquet"), oracle_sql, label=label)
        print(label, json.dumps(results[label]), flush=True)
    scaled = build_scaled("/root/testdata/sf0.1", f"/tmp/sfgraph{copies}",
                          copies)
    lbl = f"sf0.1x{copies}"
    results[lbl] = time_oracles(scaled, oracle_sql, label=lbl)
    print(lbl, json.dumps(results[lbl]), flush=True)


if __name__ == "__main__":
    main()
