"""Build a Zipf-skewed variant of the replicated scale data.

Usage: python tools/make_skew.py [factor] [src_dir] [out_dir]
Defaults: 10x /root/testdata/sf0.1 -> /root/repo/.testdata/sf1skew

Same key-offset replication as make_sf.py (join relationships survive
exactly), with three deliberate skew injections on top — the realistic
failure modes uniform replication can't exercise (VERDICT r3 next #1):

* documents: every doc with new doc_id % 5 == 3 gets ONE shared text →
  a single exact-duplicate cluster holding ~20% of the corpus
  (10k members at factor 10 on sf0.1's 5k docs), alongside the
  replication's factor-sized clusters for the rest — a Zipf head over
  a uniform tail.  Dedup pair generation, cluster resolution, and any
  text groupBy now see one massively hot key.
* lineitem: rows with new l_orderkey % 10 == 0 point l_suppkey at the
  minimum supplier key → one supplier owns ~10% of all lineitem rows
  (600k at factor 10).  The lineitem⋈supplier shuffle join now has a
  straggler-grade hot key.
* embeddings: the same % 5 == 3 vec_ids share one embedding vector →
  a 10k-member identical-vector cluster for the semantic-dedup family.

DuckDB does the work so output parquet is multi-row-group and
Spark-splittable.
"""

from __future__ import annotations

import os
import sys

import duckdb

from make_sf import OFFSET_KEYS, PK, SHARED


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.testdata/sf1skew"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    units: dict[str, int] = {}
    for t, pk in PK.items():
        base = "events" if t == "events_user" else t
        units[t] = con.execute(
            f"SELECT max({pk}) + 1 FROM "
            f"read_parquet('{src}/{base}.parquet')").fetchone()[0]
    hot_text = con.execute(
        f"SELECT text FROM read_parquet('{src}/documents.parquet') "
        f"ORDER BY doc_id LIMIT 1").fetchone()[0].replace("'", "''")
    hot_vec_id = con.execute(
        f"SELECT min(vec_id) FROM read_parquet('{src}/embeddings.parquet')"
    ).fetchone()[0]
    hot_supp = con.execute(
        f"SELECT min(s_suppkey) FROM read_parquet('{src}/supplier.parquet')"
    ).fetchone()[0]

    for t in SHARED:
        con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))"
                    f" TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(t, "copied")
    for t, keys in OFFSET_KEYS.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
        ).fetchall()]

        def expr(c: str) -> str:
            off = f"{c} + r.r * {units[keys[c]]}" if c in keys else c
            if t == "documents" and c == "text":
                return (f"CASE WHEN (doc_id + r.r * {units['documents']})"
                        f" % 5 = 3 THEN '{hot_text}' ELSE text END AS text")
            if t == "lineitem" and c == "l_suppkey":
                return (f"CASE WHEN (l_orderkey + r.r * {units['orders']})"
                        f" % 10 = 0 THEN {hot_supp} ELSE {off} END"
                        f" AS l_suppkey")
            if t == "embeddings" and c == "embedding":
                return (f"CASE WHEN (vec_id + r.r * {units['embeddings']})"
                        f" % 5 = 3 THEN (SELECT embedding FROM read_parquet("
                        f"'{src}/embeddings.parquet') WHERE vec_id = "
                        f"{hot_vec_id}) ELSE embedding END AS embedding")
            return f"{off} AS {c}"

        sel = ", ".join(expr(c) for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}/{t}.parquet'), "
            f"range({factor}) AS r(r)) TO '{out}/{t}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 262144)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)
    hot_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/documents.parquet') "
        f"WHERE doc_id % 5 = 3").fetchone()[0]
    hot_li = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/lineitem.parquet') "
        f"WHERE l_suppkey = {hot_supp}").fetchone()[0]
    print(f"hot cluster: {hot_docs} docs; hot supplier {hot_supp}: "
          f"{hot_li} lineitem rows")


if __name__ == "__main__":
    main()
