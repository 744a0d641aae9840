"""Continuous aggregation example: maintain an incrementally-merged
per-(user, day) rollup of the events stream — the hypertable pattern.

Each micro-batch folds ONLY its delta into the durable state table
(streaming/rollup_sink.py); history is never rescanned. The same state
can be finalized at any time for serving, and the state layout is
partitioned by day bucket so time-ranged serving queries prune.

Run: python examples/streaming_rollup.py [sf_dir] (default sf0.001)
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import juliadb_jl_spark as jdb
from juliadb_jl_spark.functions.rollup import rollup_finalize
from juliadb_jl_spark.sources.testdata import read_table
from juliadb_jl_spark.streaming.aggregate import stream_from_parquet
from juliadb_jl_spark.streaming.rollup_sink import RollupSink


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = tempfile.mkdtemp(prefix="rollup_stream_")
    src, state, ckpt = (os.path.join(work, d) for d in
                        ("src", "state", "ckpt"))

    spark = jdb.get_spark("streaming-rollup-example")
    ev = read_table(spark, sf_dir, "events") \
        .select("event_id", "ts", "user_id",
                F.round(F.col("value") * 100).cast("long").alias("value_c"))

    # simulate an arriving stream: two file drops
    ev.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(src)

    sink = RollupSink(state, by="user_id", cols="value_c",
                      time_col="ts", grain="day", partition_by=["bucket"])

    def run_available():
        q = (stream_from_parquet(spark, src).writeStream
             .foreachBatch(sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_available()
    n1 = sink.current(spark).count()

    ev.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(src)
    run_available()
    st = sink.current(spark)

    final = rollup_finalize(st, "value_c")
    total = final.agg(F.sum("n")).head()[0]
    print(f"state rows after drop 1: {n1}, after drop 2: {st.count()}; "
          f"events accounted: {total} (source has {ev.count()})")
    print(final.orderBy("user_id", "bucket").limit(5).toPandas())
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
