"""First-class window operators.

The reference has no window engine — its docs emulate ranks/lags/top-k
with groupby closures + flatten (JuliaDB docs/src/tutorial.md:536-641).
Spark's Window covers that whole surface natively (SURVEY.md §2.5), so we
expose it as first-class ops instead of closure emulation.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from juliadb_jl_spark.plans import selectors as S
from juliadb_jl_spark.plans.table import Table


def _win(t: Table, by: Any, order: Any, rev: bool = False):
    from juliadb_jl_spark.operators.sort import order_specs
    parts = S.resolve_names(t.df, by, t.pkey) if by is not None else []
    w = W.partitionBy(*parts) if parts else W.partitionBy()
    if order is not None:
        w = w.orderBy(*order_specs(t.df, order, t.pkey, rev))
    return w


def rank_in_group(t: Table, by: Any, order: Any, name: str = "rank",
                  rev: bool = False, method: str = "ordinal") -> Table:
    """Rank within group (reference idiom docs/src/tutorial.md:544-551,
    `ordinalrank`). method: ordinal|dense|min (row_number/dense_rank/rank)."""
    fn = {"ordinal": F.row_number, "dense": F.dense_rank, "min": F.rank}[method]
    return t._with(t.df.withColumn(name, fn().over(_win(t, by, order, rev))))


def topk_per_group(t: Table, by: Any, order: Any, k: int, rev: bool = True) -> Table:
    """Per-group top-k (reference idiom docs/src/tutorial.md:584-586,
    partialsort): row_number window + filter — Spark plans this without
    materializing whole groups."""
    df = (t.df.withColumn("__rn", F.row_number().over(_win(t, by, order, rev)))
          .filter(F.col("__rn") <= k).drop("__rn"))
    return t._with(df)


def lag_col(t: Table, col: str, n: int = 1, by: Any = None, order: Any = None,
            name: str | None = None) -> Table:
    """lag (reference idiom docs/src/tutorial.md:618-641, ShiftedArrays.lag)."""
    name = name or f"{col}_lag{n}"
    return t._with(t.df.withColumn(
        name, F.lag(col, n).over(_win(t, by, order or t.pkey))))


def lead_col(t: Table, col: str, n: int = 1, by: Any = None, order: Any = None,
             name: str | None = None) -> Table:
    name = name or f"{col}_lead{n}"
    return t._with(t.df.withColumn(
        name, F.lead(col, n).over(_win(t, by, order or t.pkey))))


def group_agg_col(t: Table, col: str, by: Any, agg: str = "avg",
                  name: str | None = None) -> Table:
    """Broadcast a group aggregate back to every row (reference idiom
    test/test_query.jl:116-118 — per-group normalization)."""
    name = name or f"{col}_{agg}"
    expr = getattr(F, agg)(F.col(col)).over(_win(t, by, None))
    return t._with(t.df.withColumn(name, expr))


def rolling(t: Table, col: str, window: int, by: Any = None, order: Any = None,
            agg: str = "avg", name: str | None = None) -> Table:
    """Trailing rolling aggregate over the previous `window` rows."""
    name = name or f"{col}_roll_{agg}{window}"
    w = _win(t, by, order or t.pkey).rowsBetween(-(window - 1), 0)
    return t._with(t.df.withColumn(name, getattr(F, agg)(F.col(col)).over(w)))


def cumulative(t: Table, col: str, by: Any = None, order: Any = None,
               agg: str = "sum", name: str | None = None) -> Table:
    name = name or f"{col}_cum{agg}"
    w = _win(t, by, order or t.pkey).rowsBetween(W.unboundedPreceding, 0)
    return t._with(t.df.withColumn(name, getattr(F, agg)(F.col(col)).over(w)))
