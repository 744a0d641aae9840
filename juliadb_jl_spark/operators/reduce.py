"""Aggregation operators: reduce / groupreduce / groupby / summarize.

Reference semantics (JuliaDB src/reduce.jl):
  * `reduce(f, t; select)` — whole-table reduction, per-chunk partial +
    treereduce merge (src/reduce.jl:5-30).
  * `groupreduce(f, t, by; select)` — per-key pairwise reduction, partial
    per chunk then merge (src/reduce.jl:41-70).
  * `groupby(f, t, by; select, flatten, usekey)` — holistic per-key vector
    function; shuffles so each group is whole (src/reduce.jl:72-105).
  * `summarize(f, t, by; select)` — f applied per selected column,
    auto-named `col_fn` (docs/src/operations.md:32).

On Spark, partial+final aggregation is exactly what HashAggregateExec
does, so `groupreduce` lowers to `groupBy(by).agg(...)` with native
expressions; `groupby` uses native functions when the reducer is
recognized and Arrow-batched `applyInPandas` for true closures.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Iterable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from juliadb_jl_spark.functions import stats as ST
from juliadb_jl_spark.plans import selectors as S
from juliadb_jl_spark.plans.table import NDSparse, Table


# ---------------------------------------------------------------------------
# Reducer-spec compiler: any reference reducer form → [(outname, aggColumn)]
# ---------------------------------------------------------------------------

def _as_stat(f: Any) -> ST.Stat | None:
    if isinstance(f, ST.Stat):
        return f
    if isinstance(f, type) and issubclass(f, ST.Stat):
        return f()
    if isinstance(f, str):
        try:
            return ST.lookup(f)
        except KeyError:
            return None
    return None


def _stat_exprs(stat: ST.Stat, col: Column, outname: str) -> list[tuple[str, Column]]:
    return [(outname + suffix, expr) for suffix, expr in stat.exprs(col)]


def compile_reducers(t: Table, f: Any, select: Any = None,
                     default_col: Column | None = None) -> list[tuple[str, Column]]:
    """Normalize every reference reducer form into named agg expressions.

    Forms (reference src/reduce.jl:5-39, tests test/test_table.jl:141-158):
    str | Stat | (sel, f) pair | tuple of forms | dict name→form.
    """
    if select is not None:
        resolved = S.resolve(t.df, select, t.pkey)
        if len(resolved) == 1:
            default_col = resolved[0][1]
    if default_col is None and select is None:
        vn = t.valnames
        if len(vn) == 1:
            default_col = F.col(vn[0])

    out: list[tuple[str, Column]] = []

    def emit(name: str | None, form: Any, col: Column | None):
        stat = _as_stat(form)
        if stat is not None:
            if col is None:
                raise ValueError(f"reducer {stat.name} needs a column; pass select=")
            out.extend(_stat_exprs(stat, col, name or stat.name))
            return
        if isinstance(form, S.Pair):
            inner = S.resolve(t.df, form.sel, t.pkey)
            icol = inner[0][1]
            stat2 = _as_stat(form.fn)
            if stat2 is not None:
                out.extend(_stat_exprs(stat2, icol, name or form.name or
                                       f"{inner[0][0]}_{stat2.name}"))
            else:
                expr = S._apply_fn(icol, form.fn, form.rtype, inner[0][0])
                out.append((name or form.name or inner[0][0], expr))
            return
        if isinstance(form, Column):
            out.append((name or "agg", form))
            return
        if isinstance(form, dict):
            for k, v in form.items():
                emit(k, v, col)
            return
        if isinstance(form, (tuple, list)):
            for v in form:
                emit(None, v, col)
            return
        raise TypeError(f"unsupported reducer form {form!r}")

    emit(None, f, default_col)
    return out


def _has_two_level(f: Any) -> bool:
    stat = _as_stat(f)
    return bool(stat is not None and getattr(stat, "two_level", False))


# ---------------------------------------------------------------------------
# reduce — whole table → scalars
# ---------------------------------------------------------------------------

def reduce_(f: Any, t: Table, select: Any = None) -> dict:
    """Whole-table reduction returning a plain dict (reference
    src/reduce.jl:5-39). Native agg for recognized forms; for a true binary
    Python closure, per-partition partial reduce (mapInPandas) + driver
    merge — the reference's treereduce shape (src/util.jl:2-8)."""
    if callable(f) and _as_stat(f) is None and not isinstance(f, S.Pair) \
            and not isinstance(f, (tuple, list, dict)):
        resolved = S.resolve(t.df, select, t.pkey)
        if len(resolved) != 1:
            raise ValueError("closure reduce needs a single selected column")
        name, col = resolved[0]
        part = t.df.select(col.alias("v"))

        def _partial(batches: Iterable[pd.DataFrame]):
            acc, seen = None, False
            for pdf in batches:
                for v in pdf["v"]:
                    acc = v if not seen else f(acc, v)
                    seen = True
            if seen:
                yield pd.DataFrame({"v": [acc]})

        partials = part.mapInPandas(_partial, part.schema).collect()
        vals = [r["v"] for r in partials]
        if not vals:
            raise ValueError("reduce over empty table")
        return {name: functools.reduce(f, vals)}

    exprs = compile_reducers(t, f, select)
    row = t.df.agg(*[c.alias(n) for n, c in exprs]).head(1)[0]
    return row.asDict()


# ---------------------------------------------------------------------------
# groupreduce — per-key pairwise reduction (native partial+final agg)
# ---------------------------------------------------------------------------

def groupreduce(f: Any, t: Table, by: Any, select: Any = None) -> Table:
    """`groupBy(by).agg(...)` with compiled reducer forms (reference
    src/reduce.jl:41-70). Output table is keyed by `by`."""
    by_resolved = S.resolve(t.df, by, t.pkey)
    by_names = [n for n, _ in by_resolved]
    gdf = t.df.select(*S.as_columns(by_resolved),
                      *[c for c in t.df.columns if c not in by_names])

    if _has_two_level(f):
        return _countmap_groupreduce(t, gdf, by_names, f, select)

    exprs = compile_reducers(t, f, select)
    out = gdf.groupBy(*by_names).agg(*[c.alias(n) for n, c in exprs])
    return Table(out, tuple(by_names))


def _countmap_groupreduce(t: Table, gdf: DataFrame, by_names: list[str],
                          f: Any, select: Any) -> Table:
    """CountMap: two native aggregations (count per value, fold to map) —
    scalable alternative to collecting raw values."""
    resolved = S.resolve(t.df, select, t.pkey)
    if len(resolved) != 1:
        raise ValueError("CountMap needs a single selected column")
    vname, vcol = resolved[0]
    counted = (gdf.groupBy(*by_names, vcol.alias(vname))
               .agg(F.count(F.lit(1)).alias("__n")))
    out = (counted.groupBy(*by_names)
           .agg(F.map_from_entries(F.array_sort(F.collect_list(
               F.struct(F.col(vname), F.col("__n"))))).alias("countmap")))
    return Table(out, tuple(by_names))


# ---------------------------------------------------------------------------
# groupby — holistic per-key function
# ---------------------------------------------------------------------------

def groupby(f: Any, t: Table, by: Any, select: Any = None,
            flatten: bool = False, usekey: bool = False,
            schema: str | None = None) -> Table:
    """Per-key vector function (reference src/reduce.jl:72-105).

    Fast path: recognized reducers (str/Stat/tuple/dict/Pair) compile to
    native `groupBy().agg()` — Spark plans partial+final aggregation, no
    Python in the loop.  Slow path: a Python callable receives the group as
    a pandas DataFrame (or Series when one column is selected) via
    Arrow-batched `applyInPandas`; scalar/dict/DataFrame results supported,
    `flatten=True` semantics come free (multi-row returns).
    """
    # Fast path — the reducer compiles natively.
    if _as_stat(f) is not None or isinstance(f, (str, tuple, list, dict, S.Pair)):
        return groupreduce(f, t, by, select)

    by_resolved = S.resolve(t.df, by, t.pkey)
    by_names = [n for n, _ in by_resolved]
    sel_resolved = S.resolve(t.df, select, t.pkey) if select is not None else \
        [(c, F.col(c)) for c in t.df.columns if c not in by_names]
    sel_names = [n for n, _ in sel_resolved]
    # a tuple/list selector always presents a DataFrame, even of one column
    single = len(sel_names) == 1 and not isinstance(select, (tuple, list))

    src = t.df.select(*S.as_columns(by_resolved),
                      *[c.alias(n) for n, c in sel_resolved])

    # Infer the output schema by running f on one sample group driver-side
    # (the reference propagates types through Julia type params; we sample).
    if schema is None:
        sample = src.limit(200).toPandas()
        if sample.empty:
            raise ValueError("cannot infer groupby schema from an empty table")
        g0 = next(iter(sample.groupby(by_names, sort=False)))[1]
        res = _call_group_fn(f, g0, by_names, sel_names, single, usekey)
        schema = _schema_of_result(src, by_names, res)

    def _apply(keys: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        res = _call_group_fn(f, pdf, by_names, sel_names, single, usekey)
        out = _result_to_pdf(res)
        for k_name, k_val in zip(by_names, keys):
            out.insert(0, k_name, k_val)
        return out

    out_df = src.groupBy(*by_names).applyInPandas(_apply, schema)
    return Table(out_df, tuple(by_names))


def _call_group_fn(f, pdf, by_names, sel_names, single, usekey):
    data = pdf[sel_names[0]] if single else pdf[sel_names]
    if usekey:
        key = tuple(pdf.iloc[0][k] for k in by_names)
        return f(key[0] if len(key) == 1 else key, data)
    return f(data)


def _result_to_pdf(res: Any) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res.reset_index(drop=True)
    if isinstance(res, pd.Series):
        return pd.DataFrame({res.name or "value": res.reset_index(drop=True)})
    if isinstance(res, dict):
        return pd.DataFrame({k: [v] for k, v in res.items()})
    if isinstance(res, (list, tuple)):
        return pd.DataFrame({"value": list(res)})
    return pd.DataFrame({"value": [res]})


def _schema_of_result(src: DataFrame, by_names: list[str], res: Any) -> str:
    spark = src.sparkSession
    pdf = _result_to_pdf(res)
    inferred = spark.createDataFrame(pdf).schema
    key_fields = [f for f in src.schema.fields if f.name in by_names]
    parts = [f"`{f.name}` {f.dataType.simpleString()}" for f in key_fields]
    parts += [f"`{f.name}` {f.dataType.simpleString()}" for f in inferred.fields]
    return ", ".join(parts)


# ---------------------------------------------------------------------------
# summarize — per-column aggregation with auto-naming
# ---------------------------------------------------------------------------

def summarize(f: Any, t: Table, by: Any, select: Any = None) -> Table:
    """Apply reducer(s) to each selected column per group (reference
    docs/src/operations.md:32, test/test_table.jl:237-243).

    Naming follows the reference exactly: one reducer → plain column
    names; several reducers over ONE column → the reducer names; several
    reducers over several columns → `col_fn`.  A dict of reducers
    (`{"m": "mean"}`) renames the reducer part, like the reference's
    `(m = mean, s = std)` named-tuple form."""
    by_resolved = S.resolve(t.df, by, t.pkey)
    by_names = [n for n, _ in by_resolved]
    if select is None:
        sel_resolved = [(c, F.col(c)) for c in t.df.columns if c not in by_names]
    else:
        sel_resolved = S.resolve(t.df, select, t.pkey)
    if isinstance(f, dict):
        raw = [(alias, form) for alias, form in f.items()]
    else:
        raw = [(None, form) for form in (f if isinstance(f, (tuple, list)) else (f,))]
    forms = []
    for alias, form in raw:
        stat = _as_stat(form)
        if stat is None:
            raise TypeError(f"summarize reducer must be recognizable, got {form!r}")
        forms.append((alias or stat.name, stat))
    multi_f, multi_c = len(forms) > 1, len(sel_resolved) > 1
    exprs: list[tuple[str, Column]] = []
    for cname, col in sel_resolved:
        for fname, stat in forms:
            if not multi_f:
                name = cname
            elif not multi_c:
                name = fname
            else:
                name = f"{cname}_{fname}"
            exprs.extend(_stat_exprs(stat, col, name))
    out = (t.df.select(*S.as_columns(by_resolved),
                       *[c for c in t.df.columns if c not in by_names])
           .groupBy(*by_names).agg(*[c.alias(n) for n, c in exprs]))
    return Table(out, tuple(by_names))


def aggregate_stats(s: Any, t: Table, by: Any = None,
                    with_: Any = None) -> Table:
    """Deprecated reference alias (src/reduce.jl:135):
    `aggregate_stats(s, t; by, with)` → `groupreduce(s, t, by; select=with)`."""
    import warnings
    warnings.warn("aggregate_stats is deprecated in the reference; "
                  "use groupreduce", DeprecationWarning, stacklevel=2)
    by = by if by is not None else tuple(t.pkey)
    return groupreduce(s, t, by=by, select=with_)


# ---------------------------------------------------------------------------
# NDSparse dimension reduction
# ---------------------------------------------------------------------------

def reducedim(f: Any, nd: NDSparse, dims: Sequence[str | int] | str | int) -> NDSparse:
    """Reduce out index dimensions (reference `reduce(f, t; dims)` →
    _reducedim src/reduce.jl:107-115): groupreduce on the kept dims.
    Dims may be names or 1-based positions (test/test_query.jl:63-78)."""
    if isinstance(dims, (str, int)):
        dims = (dims,)
    dims = [nd.pkey[d - 1] if isinstance(d, int) else d for d in dims]
    kept = [d for d in nd.pkey if d not in set(dims)]
    if not kept:
        raise ValueError("cannot reduce out all dimensions; use reduce_")
    red = groupreduce(f, nd, by=tuple(kept), select=nd.valnames[0]
                      if len(nd.valnames) == 1 else tuple(nd.valnames))
    return NDSparse(red.df, tuple(kept))


def reducedim_vec(f: Callable, nd: NDSparse, dims: Sequence[str | int] | str | int,
                  schema: str | None = None) -> NDSparse:
    """Dimension-reduce with a vector→scalar function (reference
    src/reduce.jl:117-134): holistic, via groupby's applyInPandas path.
    Dims may be names or 1-based positions."""
    if isinstance(dims, (str, int)):
        dims = (dims,)
    dims = [nd.pkey[d - 1] if isinstance(d, int) else d for d in dims]
    kept = [d for d in nd.pkey if d not in set(dims)]
    g = groupby(f, nd, by=tuple(kept),
                select=nd.valnames[0] if len(nd.valnames) == 1 else tuple(nd.valnames),
                schema=schema)
    return NDSparse(g.df, tuple(kept))
