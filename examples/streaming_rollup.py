"""Continuous aggregation example: maintain an incrementally-merged
per-(user, day) rollup of the events stream — the hypertable pattern —
plus an HLL distinct track and a stream-stream join, each ASSERTED
equal to its batch oracle (not just run).

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
from juliadb_jl_spark.streaming.aggregate import (stream_from_parquet,
                                                  stream_join)
from juliadb_jl_spark.streaming.rollup_sink import RollupSink


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = tempfile.mkdtemp(prefix="rollup_stream_")
    src, state, ckpt = (os.path.join(work, d) for d in
                        ("src", "state", "ckpt"))

    spark = jdb.get_spark("streaming-rollup-example")
    ev = read_table(spark, sf_dir, "events") \
        .select("event_id", "ts", "user_id", "event_type",
                F.round(F.col("value") * 100).cast("long").alias("value_c"))

    # simulate an arriving stream: two file drops
    ev.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(src)

    # value rollup + HLL distinct-event sketch per (user, day)
    sink = RollupSink(state, by="user_id", cols="value_c",
                      time_col="ts", grain="day", partition_by=["bucket"],
                      distinct_cols=("event_id",))

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

    final = rollup_finalize(st, "value_c").cache()
    total = final.agg(F.sum("n")).head()[0]
    n_events = ev.count()
    print(f"state rows after drop 1: {n1}, after drop 2: {st.count()}; "
          f"events accounted: {total} (source has {n_events})")
    assert total == n_events, "stream rollup lost or duplicated events"

    # exact batch oracle: same grouping computed in one batch aggregate —
    # n/sum/min/max must match EXACTLY (merge(state(A),state(B)) ≡
    # state(A∪B)); the HLL estimate must equal the batch-side sketch of
    # the same column (both are Datasketches HLL over identical inputs)
    batch = (ev.groupBy("user_id", F.date_trunc("day", "ts").alias("bucket"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("value_c").alias("value_c_sum"),
                  F.min("value_c").alias("value_c_min"),
                  F.max("value_c").alias("value_c_max"),
                  F.hll_sketch_estimate(F.hll_sketch_agg("event_id"))
                  .alias("event_id_ndistinct")))
    cmp_cols = ["user_id", "bucket", "n", "value_c_sum", "value_c_min",
                "value_c_max", "event_id_ndistinct"]
    import pandas as pd
    a = (final.select(*cmp_cols).toPandas()
         .sort_values(["user_id", "bucket"], ignore_index=True))
    b = (batch.select(*cmp_cols).toPandas()
         .sort_values(["user_id", "bucket"], ignore_index=True))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    print(f"rollup == batch oracle over {len(a)} (user, day) groups "
          "(n/sum/min/max exact, HLL sketch-identical)")

    # stream-stream join: each purchase joined to same-user clicks within
    # the preceding hour — streamed result must equal the batch form
    # (stream_join runs identically on batch frames: its own oracle)
    clicks = ev.filter(F.col("event_type") == "click") \
        .select(F.col("user_id"), F.col("ts").alias("c_ts"),
                F.col("event_id").alias("click_id"))
    buys = ev.filter(F.col("event_type") == "purchase") \
        .select("user_id", F.col("ts").alias("p_ts"),
                F.col("event_id").alias("purchase_id"))
    s_all = stream_from_parquet(spark, src, max_files_per_trigger=2)
    s_clicks = s_all.filter(F.col("event_type") == "click") \
        .select("user_id", F.col("ts").alias("c_ts"),
                F.col("event_id").alias("click_id"))
    s_buys = s_all.filter(F.col("event_type") == "purchase") \
        .select("user_id", F.col("ts").alias("p_ts"),
                F.col("event_id").alias("purchase_id"))
    joined = stream_join(s_buys, s_clicks, "user_id", "p_ts", "c_ts",
                         watermark="10 minutes", within="1 hour")
    q = (joined.writeStream.outputMode("append").format("memory")
         .queryName("ss_join").trigger(availableNow=True).start())
    q.awaitTermination(180)
    streamed = spark.table("ss_join") \
        .select("purchase_id", "click_id").toPandas() \
        .sort_values(["purchase_id", "click_id"], ignore_index=True)
    batch_join = stream_join(buys, clicks, "user_id", "p_ts", "c_ts",
                             within="1 hour") \
        .select("purchase_id", "click_id").toPandas() \
        .sort_values(["purchase_id", "click_id"], ignore_index=True)
    pd.testing.assert_frame_equal(streamed, batch_join)
    print(f"stream-stream join == batch join ({len(streamed)} "
          "purchase-click pairs)")

    print(final.orderBy("user_id", "bucket").limit(5).toPandas())
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
