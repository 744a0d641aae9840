"""Incremental rollups: mergeable per-group aggregation state.

The hypertable-rollup pattern: instead of rescanning history on every
refresh, keep a small STATE table of mergeable partial aggregates
(count / sum / min / max / sum-of-squares per value column, optionally
time-bucketed), fold new data into its own state, and MERGE the states.
merge(state(A), state(B)) == state(A ∪ B) exactly (integer aggregates),
so refreshes touch only the delta — the core of incremental
materialized-view maintenance at 100 TB, and the same state/merge pair
a Structured Streaming foreachBatch sink can apply per micro-batch.

All operators are single native groupBy aggregations (one shuffle each,
map-side partial aggregation for free); finalize is a pure projection.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _state_cols(cols: Sequence[str], distinct_cols: Sequence[str]) -> list:
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs += [F.sum(c).alias(f"{c}_sum"),
                 F.min(c).alias(f"{c}_min"),
                 F.max(c).alias(f"{c}_max"),
                 F.sum(F.col(c) * F.col(c)).alias(f"{c}_sumsq")]
    for c in distinct_cols:
        # HLL sketch: a mergeable distinct-count state (exact distinct is
        # not mergeable without keeping the full key set)
        aggs.append(F.hll_sketch_agg(c).alias(f"{c}_hll"))
    return aggs


def rollup_state(df: DataFrame, by: str | Sequence[str],
                 cols: str | Sequence[str],
                 time_col: str | None = None,
                 grain: str = "day",
                 distinct_cols: str | Sequence[str] = ()) -> DataFrame:
    """Build the mergeable state for `cols` grouped by `by` (plus an
    optional `date_trunc(grain, time_col)` bucket column named
    `bucket`). Value columns should be integer-typed (e.g. cents) so
    merge is exact and order-independent. `distinct_cols` adds a
    mergeable HyperLogLog sketch per listed column (finalized to an
    approximate distinct count) — the only distinct-count shape whose
    incremental maintenance stays O(state) at 100 TB."""
    by_cols = [by] if isinstance(by, str) else list(by)
    cols = [cols] if isinstance(cols, str) else list(cols)
    dcols = ([distinct_cols] if isinstance(distinct_cols, str)
             else list(distinct_cols))
    keys = [F.col(c) for c in by_cols]
    if time_col is not None:
        keys.append(F.date_trunc(grain, F.col(time_col)).alias("bucket"))
    return df.groupBy(*keys).agg(*_state_cols(cols, dcols))


def rollup_merge(*states: DataFrame) -> DataFrame:
    """Merge state tables (same schema): union + re-aggregate. The
    key columns are everything that is not a state column."""
    first = states[0]
    state_suffix = ("_sum", "_min", "_max", "_sumsq", "_hll")
    keys = [c for c in first.columns
            if c != "n" and not c.endswith(state_suffix)]
    merged = first
    for s in states[1:]:
        merged = merged.unionByName(s)
    aggs = [F.sum("n").alias("n")]
    for c in first.columns:
        if c.endswith("_sum") or c.endswith("_sumsq"):
            aggs.append(F.sum(c).alias(c))
        elif c.endswith("_min"):
            aggs.append(F.min(c).alias(c))
        elif c.endswith("_max"):
            aggs.append(F.max(c).alias(c))
        elif c.endswith("_hll"):
            aggs.append(F.hll_union_agg(c).alias(c))
    return merged.groupBy(*keys).agg(*aggs)


def rollup_finalize(state: DataFrame, cols: str | Sequence[str],
                    ddof: int = 1) -> DataFrame:
    """Project the state into final statistics: n, per-col sum/min/max,
    mean and variance ((sumsq - sum²/n)/(n-ddof), computed in double
    with a fixed expression tree so any engine evaluating the same
    formula gets bit-identical results)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    out = state
    for c in cols:
        n = F.col("n").cast("double")
        s = F.col(f"{c}_sum").cast("double")
        ss = F.col(f"{c}_sumsq").cast("double")
        out = out.withColumn(f"{c}_mean", s / n)
        out = out.withColumn(
            f"{c}_var",
            F.when(F.col("n") > ddof,
                   (ss - s * s / n) / (n - F.lit(float(ddof))))
            .otherwise(F.lit(None).cast("double")))
        out = out.drop(f"{c}_sumsq")
    for c in out.columns:
        if c.endswith("_hll"):
            base = c[:-len("_hll")]
            out = out.withColumn(f"{base}_ndistinct",
                                 F.hll_sketch_estimate(F.col(c))) \
                .drop(c)
    return out
