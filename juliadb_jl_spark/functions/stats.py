"""OnlineStats-equivalent reducers that lower to native Spark aggregates.

The reference reduces with OnlineStat objects fitted per chunk and merged
across chunks (JuliaDB docs/src/onlinestats.md:19-47, merge dispatch
src/reduce.jl:1-3).  Spark's partial+final HashAggregate IS that model, so
each stat here simply lowers to one or more built-in aggregate expressions
(SURVEY.md §2.4 mapping table).  Stats whose reference result is an object
(Mean, Variance, ...) surface their `value()` directly as numeric columns.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Stat:
    """Base reducer. `exprs(col)` returns [(suffix, aggregate Column)];
    an empty suffix means "use the caller's output name as-is"."""

    name: str = "stat"

    def exprs(self, col: Column) -> list[tuple[str, Column]]:
        raise NotImplementedError


class Mean(Stat):
    name = "mean"

    def exprs(self, col):
        return [("", F.avg(col))]


class Sum(Stat):
    name = "sum"

    def exprs(self, col):
        return [("", F.sum(col))]


class Min(Stat):
    name = "min"

    def exprs(self, col):
        return [("", F.min(col))]


class Max(Stat):
    name = "max"

    def exprs(self, col):
        return [("", F.max(col))]


class Count(Stat):
    name = "count"

    def exprs(self, col):
        return [("", F.count(col))]


class Variance(Stat):
    """Sample variance (OnlineStats `Variance`)."""
    name = "var"

    def exprs(self, col):
        return [("", F.var_samp(col))]


class Std(Stat):
    name = "std"

    def exprs(self, col):
        return [("", F.stddev_samp(col))]


class Extrema(Stat):
    """min+max pair (OnlineStats `Extrema`)."""
    name = "extrema"

    def exprs(self, col):
        return [("_min", F.min(col)), ("_max", F.max(col))]


class Median(Stat):
    name = "median"

    def exprs(self, col):
        return [("", F.median(col))]


class Quantile(Stat):
    """Exact percentile (OnlineStats `Quantile` surfaced exactly)."""

    def __init__(self, q: float):
        self.q = q
        self.name = f"q{q}"

    def exprs(self, col):
        return [("", F.percentile(col, F.lit(self.q)))]


class ApproxQuantile(Stat):
    """percentile_approx — the scale path for quantiles."""

    def __init__(self, q: float, accuracy: int = 10000):
        self.q, self.accuracy = q, accuracy
        self.name = f"aq{q}"

    def exprs(self, col):
        return [("", F.percentile_approx(col, self.q, self.accuracy))]


class CountMap(Stat):
    """value→count map (OnlineStats `CountMap`), as a sorted map column.

    Needs a two-level aggregation (count per (group, value), then fold
    into a map) — `groupreduce` recognizes this stat and plans that
    native two-stage groupBy instead of calling `exprs`."""
    name = "countmap"
    two_level = True

    def exprs(self, col):
        raise NotImplementedError("CountMap is planned by groupreduce")


class Distinct(Stat):
    name = "ndistinct"

    def exprs(self, col):
        return [("", F.count_distinct(col))]


class ApproxDistinct(Stat):
    name = "approx_ndistinct"

    def exprs(self, col):
        return [("", F.approx_count_distinct(col))]


class Hist(Stat):
    """Fixed-edge histogram (OnlineStats `Hist`): counts per bucket as an
    array column. Lowered to conditional sums — fully native/partial-agg."""

    def __init__(self, edges: Sequence[float]):
        self.edges = list(edges)
        self.name = "hist"

    def exprs(self, col):
        buckets = []
        for lo, hi in zip(self.edges, self.edges[1:]):
            buckets.append(F.sum(F.when((col >= lo) & (col < hi), 1).otherwise(0)))
        return [("", F.array(*buckets))]


class First(Stat):
    name = "first"

    def exprs(self, col):
        return [("", F.first(col, ignorenulls=True))]


class Last(Stat):
    name = "last"

    def exprs(self, col):
        return [("", F.last(col, ignorenulls=True))]


def mosaic(df, xcol: str, ycol: str):
    """OnlineStats `Mosaic`: co-occurrence count matrix of two categorical
    columns (reference docs/src/plotting.md:45-103) — rows = x values,
    one column per y value. Two native aggregations, no Python."""
    counted = df.groupBy(xcol, ycol).count()
    return counted.groupBy(xcol).pivot(ycol).sum("count").na.fill(0)


def partition_stat(df, xcol: str, ycol: str, nbins: int = 10, agg: str = "avg"):
    """OnlineStats `Partition`/`IndexedPartition`: bucketize `xcol` into
    nbins equal-width bins and aggregate `ycol` per bin — the streaming
    plot-summary shape, as one native pass + a tiny min/max pre-pass."""
    lo, hi = df.agg(F.min(xcol), F.max(xcol)).head(1)[0]
    width = (hi - lo) / nbins if hi != lo else 1
    bin_ = F.least(F.floor((F.col(xcol) - F.lit(lo)) / F.lit(width)),
                   F.lit(nbins - 1)).cast("int").alias("bin")
    return (df.groupBy(bin_)
            .agg(F.count(F.lit(1)).alias("n"),
                 getattr(F, agg)(F.col(ycol)).alias(f"{ycol}_{agg}"),
                 F.min(xcol).alias(f"{xcol}_min"),
                 F.max(xcol).alias(f"{xcol}_max")))


def partitionplot(df, x, y=None, stat: str = "extrema", nparts: int = 100,
                  by=None, dropmissing: bool = False):
    """Data layer of the reference's `partitionplot` recipe
    (src/recipes.jl:6-40; docs/src/plotting.md:106-118): summarize `y`
    over ~`nparts` equal sections of `x` — row position 1:n when only one
    selection is given — optionally per `by` group (each group gets its
    own x-sections, as each group's Partition object does in the
    reference).  Returns the per-section stat table the recipe renders;
    the rendering itself is plotting-stack territory and out of scope.

    Scale shape: no-`by` bins use a tiny driver min/max pre-pass + one
    grouped aggregation; per-`by` bins use a window partitioned on `by`
    (parallel across groups — never a global single-partition window)."""
    from juliadb_jl_spark.operators.reduce import _as_stat, _stat_exprs
    if hasattr(df, "df"):
        df = df.df
    if y is None:
        from juliadb_jl_spark.operators.sort import with_global_rownum
        y, x = x, "__x"
        df = with_global_rownum(df, "__x")
    if dropmissing:
        df = df.na.drop(subset=[x, y])
    st = _as_stat(stat)
    if st is None:
        raise TypeError(f"unrecognized partitionplot stat {stat!r}")
    gb = [by] if isinstance(by, str) else list(by or ())
    xv = F.col(x).cast("double")
    if gb:
        from pyspark.sql import Window as W
        w = W.partitionBy(*gb)
        lo, hi = F.min(xv).over(w), F.max(xv).over(w)
        width = F.when(hi != lo, (hi - lo) / nparts).otherwise(F.lit(1.0))
        bin_ = F.least(F.floor((xv - lo) / width), F.lit(nparts - 1))
    else:
        lo_v, hi_v = df.agg(F.min(xv), F.max(xv)).head(1)[0]
        width = (hi_v - lo_v) / nparts if hi_v != lo_v else 1.0
        bin_ = F.least(F.floor((xv - F.lit(lo_v)) / F.lit(width)),
                       F.lit(nparts - 1))
    binned = df.withColumn("__part", bin_.cast("int"))
    aggs = [F.count(F.lit(1)).alias("n"),
            F.min(xv).alias(f"{x}_min"), F.max(xv).alias(f"{x}_max")]
    aggs += [expr.alias(name)
             for name, expr in _stat_exprs(st, F.col(y), y)]
    return (binned.groupBy(*gb, F.col("__part").alias("part"))
            .agg(*aggs))


def partitionplot_render(sections, x: str, y_cols=None, by=None,
                         path_or_buf=None, title: str | None = None):
    """Rendering veneer over the `partitionplot` data layer (the reference
    renders via ~50 LoC of Plots.jl recipes, src/recipes.jl).  Import-gated
    exactly like the PIL decode path: raises NotImplementedError when
    matplotlib is not installed — the data layer stays fully functional
    either way.  `sections` is `partitionplot(...)` output (a ≤nparts-row
    table per group — collecting it to the driver IS the point of a plot).

    Draws one line per (group, stat column) against the section midpoint;
    writes PNG to `path_or_buf` when given, else returns the Figure."""
    try:
        import matplotlib
    except ImportError as ex:
        raise NotImplementedError(
            "partitionplot_render requires matplotlib (not installed); "
            "the partitionplot() data layer works without it") from ex
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    pdf = sections.toPandas() if hasattr(sections, "toPandas") else sections
    lo, hi = f"{x}_min", f"{x}_max"
    mid = (pdf[lo] + pdf[hi]) / 2.0
    skip = {lo, hi, "part", "n"}
    gb = [by] if isinstance(by, str) else list(by or ())
    if y_cols is None:
        y_cols = [c for c in pdf.columns
                  if c not in skip and c not in gb
                  and pdf[c].dtype.kind in "if"]
    fig, ax = plt.subplots()
    groups = pdf.groupby(gb) if gb else [((), pdf)]
    for key, g in groups:
        g = g.sort_values("part")
        label_key = ",".join(str(k) for k in (
            key if isinstance(key, tuple) else (key,))) if gb else ""
        for yc in y_cols:
            label = f"{label_key}:{yc}" if label_key else yc
            ax.plot(mid.loc[g.index], g[yc], label=label)
    ax.set_xlabel(x)
    ax.legend(fontsize="small")
    if title:
        ax.set_title(title)
    if path_or_buf is not None:
        fig.savefig(path_or_buf, format="png")
        plt.close(fig)
        return None
    return fig


# String shorthands accepted wherever a reducer is expected.
_BY_NAME: dict[str, Any] = {
    "sum": Sum, "mean": Mean, "avg": Mean, "min": Min, "max": Max,
    "count": Count, "length": Count, "var": Variance, "std": Std,
    "median": Median, "extrema": Extrema, "first": First, "last": Last,
    "countdistinct": Distinct, "ndistinct": Distinct,
    "approxdistinct": ApproxDistinct,
}


def lookup(name: str) -> Stat:
    cls = _BY_NAME.get(name.lower())
    if cls is None:
        raise KeyError(f"unknown reducer {name!r}; known: {sorted(_BY_NAME)}")
    return cls()


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  exact_distinct: bool = True) -> DataFrame:
    """Per-column data-quality profile — the table every ingest QA
    publishes: row count, null count/fraction, distinct count, and
    min/max (as strings, so heterogeneous columns share one schema).

    Returns one row per profiled column:
    (column, dtype, n_rows, n_null, null_frac, n_distinct,
    min_value, max_value). Non-orderable types (maps/structs) report
    NULL min/max.

    Scale (100 TB): nulls and min/max for EVERY column ride one
    aggregation pass. `exact_distinct=True` adds exact
    count(DISTINCT) per column — Spark plans multiple distincts via
    an Expand (one input-row replica per distinct column); at scale
    set it False for `approx_count_distinct` (±2.3% HLL), which keeps
    the single no-Expand pass."""
    from pyspark.sql.types import (AtomicType, BooleanType, DateType,
                                   NumericType, StringType,
                                   TimestampType)
    cols = columns or df.columns
    fields = {f.name: f for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    orderable = {}
    for i, c in enumerate(cols):
        f = fields[c]
        aggs.append(F.sum(F.col(c).isNull().cast("long"))
                    .alias(f"__null{i}"))
        if exact_distinct:
            aggs.append(F.countDistinct(F.col(c)).alias(f"__d{i}"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c))
                        .alias(f"__d{i}"))
        orderable[c] = isinstance(
            f.dataType, (NumericType, StringType, TimestampType,
                         DateType, BooleanType, AtomicType))
        if orderable[c]:
            aggs.append(F.min(F.col(c)).cast("string")
                        .alias(f"__min{i}"))
            aggs.append(F.max(F.col(c)).cast("string")
                        .alias(f"__max{i}"))
    row = df.agg(*aggs)
    structs = []
    for i, c in enumerate(cols):
        null_s = F.lit(None).cast("string")
        structs.append(F.struct(
            F.lit(c).alias("column"),
            F.lit(fields[c].dataType.simpleString()).alias("dtype"),
            F.col("__n").alias("n_rows"),
            F.col(f"__null{i}").alias("n_null"),
            F.when(F.col("__n") > 0,
                   F.col(f"__null{i}") / F.col("__n"))
            .otherwise(F.lit(0.0)).alias("null_frac"),
            F.col(f"__d{i}").alias("n_distinct"),
            (F.col(f"__min{i}") if orderable[c] else null_s)
            .alias("min_value"),
            (F.col(f"__max{i}") if orderable[c] else null_s)
            .alias("max_value")))
    return row.select(F.inline(F.array(*structs)))
