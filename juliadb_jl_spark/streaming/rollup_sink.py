"""Streaming incremental-rollup maintenance: the hypertable pattern.

A `RollupSink` is a `foreachBatch` target that folds each micro-batch
into a durable mergeable-state table (functions/rollup.py): per batch it
builds state over JUST the delta and merges it with the stored state —
history is never rescanned, so refresh cost is O(delta + state), not
O(history). At 100 TB this is the only viable continuous-aggregation
shape: the state table is one row per (group, bucket), orders of
magnitude smaller than the raw stream.

Durability/exactly-once: each batch writes a NEW state version directory
named by the Structured Streaming batch id, and reads the newest version
STRICTLY OLDER than the current batch — a retried batch therefore
re-merges from the same predecessor instead of double-counting
(idempotent under foreachBatch's at-least-once replay). Old versions are
pruned after a successful write.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from juliadb_jl_spark.functions.rollup import rollup_merge, rollup_state


class RollupSink:
    """foreachBatch target maintaining a rollup-state table at `path`.

    >>> sink = RollupSink("/data/state", by="user_id", cols="value_c",
    ...                   time_col="ts", grain="hour")
    >>> stream.writeStream.foreachBatch(sink).start()

    `current(spark)` returns the latest merged state (or None);
    finalize with functions.rollup.rollup_finalize."""

    def __init__(self, path: str, by, cols, time_col: str | None = None,
                 grain: str = "day", keep_versions: int = 2,
                 partition_by: list[str] | None = None,
                 distinct_cols=()):
        self.path = path
        self.by, self.cols = by, cols
        self.time_col, self.grain = time_col, grain
        self.keep_versions = keep_versions
        # HLL mergeable-distinct state (functions/rollup.rollup_state):
        # merged across batches exactly like the sum/count/min/max state
        self.distinct_cols = distinct_cols
        # e.g. partition_by=["bucket"]: state files laid out by time
        # bucket, so serving queries with a bucket predicate read only
        # matching partitions (partition pruning on the state table)
        self.partition_by = partition_by

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        out = []
        for d in os.listdir(self.path):
            if d.startswith("v") and d[1:].isdigit() and \
                    os.path.exists(os.path.join(self.path, d, "_SUCCESS")):
                out.append(int(d[1:]))
        return sorted(out)

    def _latest_before(self, batch_id: int) -> int | None:
        older = [v for v in self._versions() if v < batch_id]
        return older[-1] if older else None

    def current(self, spark: SparkSession) -> DataFrame | None:
        vs = self._versions()
        if not vs:
            return None
        return spark.read.parquet(os.path.join(self.path, f"v{vs[-1]}"))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = rollup_state(batch_df, self.by, self.cols,
                             time_col=self.time_col, grain=self.grain,
                             distinct_cols=self.distinct_cols)
        prev_v = self._latest_before(batch_id)
        if prev_v is not None:
            prev = spark.read.parquet(os.path.join(self.path, f"v{prev_v}"))
            merged = rollup_merge(prev, delta)
        else:
            merged = delta
        target = os.path.join(self.path, f"v{batch_id}")
        writer = merged.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(target)
        # prune versions older than the predecessors a retry could need
        for v in self._versions()[:-self.keep_versions]:
            shutil.rmtree(os.path.join(self.path, f"v{v}"),
                          ignore_errors=True)
