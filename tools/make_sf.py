"""Scale up the driver testdata by integer replication with key offsets.

Usage: python tools/make_sf.py [factor] [src_dir] [out_dir]
Defaults: 10x /root/testdata/sf0.1 -> /root/repo/.testdata/sf1

Replica r offsets every primary/foreign key by r * (max_key + 1) of its
table, so uniqueness and join relationships (orders->customer,
lineitem->orders/part/supplier) survive exactly; dimension constants
(region, nation) are shared, like TPC-H scaling.  Non-key payload is
copied verbatim — documents/embeddings replicas are exact duplicates by
design (a realistic dedup stress: every doc belongs to a factor-sized
duplicate cluster).  DuckDB does the replication so the output parquet
is multi-row-group and Spark-splittable.
"""

from __future__ import annotations

import os
import sys

import duckdb

OFFSET_KEYS = {
    # table -> {column: offset-unit table}
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
SHARED = ["region", "nation"]
PK = {"customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
      "orders": "o_orderkey", "events": "event_id", "documents": "doc_id",
      "embeddings": "vec_id", "events_user": "user_id"}


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.testdata/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    units: dict[str, int] = {}
    for t, pk in PK.items():
        base = "events" if t == "events_user" else t
        units[t] = con.execute(
            f"SELECT max({pk}) + 1 FROM "
            f"read_parquet('{src}/{base}.parquet')").fetchone()[0]
    for t in SHARED:
        con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))"
                    f" TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(t, "copied")
    for t, keys in OFFSET_KEYS.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
        ).fetchall()]
        sel = ", ".join(
            f"{c} + r.r * {units[keys[c]]} AS {c}" if c in keys else c
            for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}/{t}.parquet'), "
            f"range({factor}) AS r(r)) TO '{out}/{t}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 262144)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
