"""Audit Spark-vs-oracle result DTYPES for every queries() entry.

The driver's value hasher may be dtype-sensitive (e.g. int64 3 vs
float64 3.0 serializing differently), while tools/check_contract.py
canonicalizes floats — so a dtype mismatch passes locally but can
hash-fail in the driver. This tool runs every query + oracle at sf0.01
and reports any column whose pandas dtype class differs between the
two sides (int vs float vs object vs datetime).

Usage: python tools/dtype_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def dclass(s: pd.Series) -> str:
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as E
    from juliadb_jl_spark.session import get_spark
    spark = get_spark("dtype-audit", cpus=16, shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, osql = E.queries(), E.oracle_sql()
    n_flag = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in osql:
            continue
        try:
            sdf = fn(spark, sf).toPandas()
            odf = con.execute(osql[name]).df()
        except Exception as ex:
            print(f"ERR   {name}: {ex}")
            n_flag += 1
            continue
        mism = []
        for c in sdf.columns:
            if c not in odf.columns:
                continue
            a, b = dclass(sdf[c]), dclass(odf[c])
            if a != b:
                mism.append(f"{c}: spark={sdf[c].dtype} oracle={odf[c].dtype}")
        if mism:
            n_flag += 1
            print(f"FLAG  {name}: " + "; ".join(mism))
        else:
            print(f"ok    {name}")
    print(f"\nflagged: {n_flag}")


if __name__ == "__main__":
    main()
