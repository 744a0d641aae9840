"""Loader for the driver-generated TPC-H-ish testdata (TESTDATA.md).

Timestamp normalization: the generated parquet has stored timestamps two
ways across driver rounds — TIMESTAMP(NANOS) (read as bigint under
`spark.sql.legacy.parquet.nanosAsLong`, converted here via `DIV 1000`,
matching DuckDB's ns→µs truncation) and plain `timestamp[us]` with
isAdjustedToUTC=false (read as TIMESTAMP_NTZ). Both are normalized to
session-tz TIMESTAMP (LTZ) so every downstream operator sees one type;
the engine session pins `spark.sql.session.timeZone=UTC`, making the
NTZ→LTZ cast value-preserving and bit-identical to the DuckDB oracle's
naive reading.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# columns stored as TIMESTAMP(NANOS) that surface as long under
# nanosAsLong and need conversion
_NANOS_TS = {"events": ["ts"]}


_CACHE: dict = {}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. With SPARK_GRAFT_CACHE_INPUT=1 (set by
    bench.py), the table is repartitioned across cores and persisted on
    first read — the testdata files are single-row-group parquet, which
    Spark cannot split, so cold scans are single-threaded; the bench
    protocol is median-of-warm-runs (BASELINE.md), where the in-memory
    copy is the realistic hot path."""
    key = (id(spark), sf_dir, name)
    if key in _CACHE:
        return _CACHE[key]
    if name in _NANOS_TS:
        # a session built outside get_spark() (e.g. the driver's) errors on
        # TIMESTAMP(NANOS) parquet unless this runtime conf is set
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _NANOS_TS.get(name, []):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` DIV 1000)"))
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    if os.environ.get("SPARK_GRAFT_CACHE_INPUT") == "1":
        df = df.repartition(spark.sparkContext.defaultParallelism).persist()
    _CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: list[str] | None = None) -> dict[str, DataFrame]:
    out = {}
    for name in names or TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = read_table(spark, sf_dir, name)
    return out
