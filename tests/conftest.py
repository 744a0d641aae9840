"""Shared fixtures: one SparkSession per test run, duckdb oracle helper.

Test strategy mirrors the reference's differential testing (SURVEY.md §5):
distributed result ≡ oracle result, here "PySpark ≡ DuckDB on the same
parquet", plus inline golden tables for exact semantics.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="session")
def spark():
    from juliadb_jl_spark.session import get_spark
    # cpus=4 (r10, VERDICT r9 #7): at sf0.001 every test job is
    # task-launch-overhead bound, so FEWER local threads cut suite wall
    # directly — measured per-module A/B: cpus=4 is ~25 % faster than
    # the r9 cpus=16 (test_clustering 78 → 59 s) and faster than 2, 8,
    # or 16; AQE-off and shuffle_partitions=4 both measured WORSE.
    # shuffle_partitions stays 8 so shuffle-shape assertions and
    # per-partition semantics are unchanged (tests that need a specific
    # layout repartition explicitly).  Override via SPARK_GRAFT_TEST_CPUS.
    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "4"))
    s = get_spark("juliadb_jl_spark-tests", cpus=cpus,
                  shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


@pytest.fixture(scope="session")
def tables(spark):
    from juliadb_jl_spark.plans.table import Table
    from juliadb_jl_spark.sources.testdata import load_tables
    return {name: Table(df) for name, df in load_tables(spark, SF_DIR).items()}


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame,
                        sort_cols: list[str] | None = None, atol: float = 1e-9):
    """Order-insensitive frame comparison (the driver's compare shape)."""
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), \
        f"columns differ: {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    cols = sorted(spark_pdf.columns)
    a = spark_pdf[cols].sort_values(cols, ignore_index=True)
    b = oracle_pdf[cols].sort_values(cols, ignore_index=True)
    assert len(a) == len(b), f"row counts differ: {len(a)} vs {len(b)}"
    for c in cols:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            pd.testing.assert_series_equal(
                av.astype(float), bv.astype(float), check_names=False,
                rtol=1e-6, atol=atol)
        else:
            assert av.astype(str).tolist() == bv.astype(str).tolist(), \
                f"column {c} differs"


def check_vs_oracle(df, duck, sql: str, **kw):
    """Run a Spark DataFrame and a DuckDB SQL, assert equivalence."""
    spark_pdf = df.toPandas()
    oracle_pdf = duck.execute(sql).df()
    assert_frames_match(spark_pdf, oracle_pdf, **kw)
