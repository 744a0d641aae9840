"""Database connectors via Spark's JDBC source.

Reference: JuliaDB interfaces databases through the JuliaDatabases
packages and `MySQL.query(conn, sql) |> table` (docs/src/tutorial.md:
706-720).  Spark's JDBC source is the native equivalent — and adds the
scale path the reference lacks: `partition_column`/`num_partitions`
split the read into parallel range queries, so a 1000-executor cluster
pulls a big table through many concurrent connections instead of one.

Tested against the Derby driver that ships with Spark; any JDBC driver
on the classpath (MySQL, Postgres, ...) works identically.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import SparkSession

from juliadb_jl_spark.plans.table import Table


def load_jdbc(url: str, table: str, spark: SparkSession | None = None,
              pkey: Sequence[str] | str = (),
              partition_column: str | None = None,
              num_partitions: int | None = None,
              lower_bound: Any = None, upper_bound: Any = None,
              driver: str | None = None,
              properties: dict | None = None) -> Table:
    """Read a database table (or a `(SELECT ...) alias` subquery) into a
    Table — the engine-side form of the reference's
    `MySQL.query(conn, sql) |> table` idiom.

    For parallel reads pass `partition_column` (a numeric/date column)
    with `lower_bound`/`upper_bound`/`num_partitions`: Spark issues one
    range-bounded query per partition.  Without it the read is a single
    connection — fine for dimension tables, wrong for facts.
    """
    spark = spark or SparkSession.getActiveSession()
    reader = spark.read.format("jdbc").option("url", url) \
        .option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or not num_partitions:
            raise ValueError("partitioned JDBC read needs partition_column, "
                             "lower_bound, upper_bound AND num_partitions")
        reader = (reader.option("partitionColumn", partition_column)
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound))
                  .option("numPartitions", str(num_partitions)))
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    df = reader.load()
    return Table(df, tuple((pkey,) if isinstance(pkey, str) else pkey))


def save_jdbc(t: Table, url: str, table: str, mode: str = "error",
              driver: str | None = None,
              batch_size: int = 10_000,
              properties: dict | None = None) -> None:
    """Write a Table to a database table through JDBC (`batchsize` rows
    per executor-side INSERT batch; each partition writes over its own
    connection, so write parallelism = partition count)."""
    writer = t.df.write.format("jdbc").option("url", url) \
        .option("dbtable", table).option("batchsize", str(batch_size)) \
        .mode(mode)
    if driver:
        writer = writer.option("driver", driver)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
