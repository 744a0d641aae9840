"""Streaming ingest-QA: cumulative curation-funnel counters.

A `FunnelSink` is a `foreachBatch` target that folds each micro-batch's
filter-cascade audit (curation.curation_funnel) into a durable counter
table: per batch it computes the funnel over JUST the delta and SUMS it
into the stored state — funnel counters are additive over disjoint row
sets, so the merged table equals the one-shot funnel over everything
ingested so far. This is the live "what is our cleaning dropping"
dashboard for a continuously-ingesting 100 TB pipeline: state is
(n_stages+1) rows (× groups with `by=`), never the corpus.

Durability/exactly-once: reuses RollupSink's versioned-directory
protocol (write state vN named by the streaming batch id, merge from
the newest version STRICTLY older than N) — a retried batch re-merges
from the same predecessor instead of double-counting.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from juliadb_jl_spark.functions.curation import curation_funnel
from juliadb_jl_spark.streaming.rollup_sink import RollupSink


class FunnelSink(RollupSink):
    """foreachBatch target maintaining cumulative funnel counters at
    `path`.

    >>> sink = FunnelSink("/data/funnel_state",
    ...                   stages=[("min_len", F.col("n_chars") >= 100)],
    ...                   token_col=F.col("n_tokens"), by="source")
    >>> stream.writeStream.foreachBatch(sink).start()

    `current(spark)` returns the latest cumulative funnel (or None)."""

    def __init__(self, path: str, stages: list[tuple[str, Column]],
                 token_col: Column | None = None, by: str | None = None,
                 keep_versions: int = 2):
        # reuse RollupSink's version-directory plumbing only; the
        # rollup-specific fields stay unused
        super().__init__(path, by=by, cols=(),
                         keep_versions=keep_versions)
        self.stages = stages
        self.token_col = token_col

    def _keys(self) -> list[str]:
        keys = ["stage_idx", "stage"]
        return ([self.by] + keys) if self.by else keys

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = curation_funnel(batch_df, self.stages,
                                token_col=self.token_col, by=self.by)
        prev_v = self._latest_before(batch_id)
        if prev_v is not None:
            prev = spark.read.parquet(
                os.path.join(self.path, f"v{prev_v}"))
            counters = [c for c in delta.columns if c not in self._keys()]
            merged = (prev.unionByName(delta)
                      .groupBy(*self._keys())
                      .agg(*[F.sum(c).alias(c) for c in counters]))
        else:
            merged = delta
        target = os.path.join(self.path, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(target)
        import shutil
        for v in self._versions()[:-self.keep_versions]:
            shutil.rmtree(os.path.join(self.path, f"v{v}"),
                          ignore_errors=True)
