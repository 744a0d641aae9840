"""Driver-style correctness check: run every queries() entry at sf0.01 and
compare against oracle_sql() via DuckDB — row count + column names +
order-insensitive value hash (floats canonicalized like a hasher would).

Usage: python tools/check_contract.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    pdf = pdf[cols].copy()
    for c in cols:
        s = pdf[c]
        if pd.api.types.is_float_dtype(s):
            pdf[c] = s.round(9)
        elif pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]")
    pdf = pdf.sort_values(cols, ignore_index=True)
    payload = pdf.to_csv(index=False, float_format="%.9g")
    return hashlib.md5(payload.encode()).hexdigest()


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as E
    from juliadb_jl_spark.session import get_spark
    spark = get_spark("contract-check", cpus=16, shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, osql = E.queries(), E.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            n_fail += 1
            continue
        el = time.time() - t0
        if name not in osql:
            print(f"rows  {name}: {len(sdf)} rows ({el:.1f}s) [no oracle]")
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(osql[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: oracle error: {ex}")
            n_fail += 1
            continue
        problems = []
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if not problems and canon(sdf) != canon(odf):
            problems.append("value hash mismatch")
        # Dtype-class guard (r7): an int-vs-float mismatch (e.g. an
        # uncast DuckDB sum(CASE) returning HUGEINT→float64 against
        # Spark's int64) passes THIS canonicalizing hash but fails a
        # repr-sensitive hasher — it red-flagged q9j/q9k/q9r in the
        # driver for two rounds. Treat as a FAILURE here so it can
        # never ship silently again.
        if not problems:
            def _dc(s):
                if pd.api.types.is_float_dtype(s):
                    return "float"
                if pd.api.types.is_integer_dtype(s):
                    return "int"
                if pd.api.types.is_bool_dtype(s):
                    return "bool"
                if pd.api.types.is_datetime64_any_dtype(s):
                    return "datetime"
                return "object"
            mism = [f"{c}: spark={sdf[c].dtype} oracle={odf[c].dtype}"
                    for c in sdf.columns if _dc(sdf[c]) != _dc(odf[c])]
            # intentional exception: the dtype canary's whole point is
            # carrying this mismatch into the driver run
            if mism and name != "qdg_dtype_canary":
                problems.append("dtype mismatch: " + "; ".join(mism))
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sdf)} rows ({el:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
