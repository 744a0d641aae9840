"""Projection / filter / column-manipulation operators.

Reference semantics: JuliaDB src/selection.jl (map/filter/dropmissing/
convertmissing/selectkeys/selectvalues/convertdim) and IndexedTables'
select/transform/rename/insertcols re-exported at src/JuliaDB.jl:27-37.
Everything compiles to native DataFrame ops so Catalyst can push filters
and prune columns into the scan.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from juliadb_jl_spark.plans import selectors as S
from juliadb_jl_spark.plans.table import NDSparse, Table


def select(t: Table, sel: Any) -> Table:
    """Project by selector DSL (reference docs/src/basics.md:59-114).

    A single-selector select returns a 1-column table; tuples multi-select.
    Pkey columns that survive the projection keep their pkey status.
    """
    resolved = S.resolve(t.df, sel, t.pkey)
    out = t.df.select(*S.as_columns(resolved))
    names = [n for n, _ in resolved]
    new_pkey = tuple(k for k in t.pkey if k in names)
    # pkey survives only as its prefix (sorted-ness needs prefix order)
    prefix: list[str] = []
    for k in t.pkey:
        if k in names:
            prefix.append(k)
        else:
            break
    cls = type(t)
    return cls(out, tuple(prefix), t.presorted and tuple(prefix) == t.pkey)


def _row_closure_udf(fn: Callable, sel_resolved, rtype) -> Column:
    """Whole-row Python closure over a multi-column selection: the
    selection rides in ONE struct column (Arrow batch → pandas DataFrame),
    the closure is applied per row with attribute access (`p.x`)."""
    import pandas as pd
    struct_out = isinstance(rtype, T.StructType)

    def _apply(pdf):
        vals = [fn(row) for row in pdf.itertuples(index=False)]
        # a StructType return contract wants a DataFrame (one column per
        # field); scalar contracts want a Series
        return pd.DataFrame(vals) if struct_out else pd.Series(vals)

    udf = F.pandas_udf(_apply, rtype)
    return udf(F.struct(*[c.alias(n) for n, c in sel_resolved]))


def _pred_cond(col: Column, p: Any) -> Column:
    """Compile one per-column predicate: Column-returning callable (native),
    Python closure (pandas_udf fallback), or literal equality."""
    if callable(p):
        out = None
        try:
            out = p(col)
        except S._PROBE_ERRORS:
            out = None
        if isinstance(out, Column):
            return out
        udf = F.pandas_udf(lambda s, _p=p: s.map(_p), T.BooleanType())
        return udf(col)
    return col == p


def filter_(t: Table, pred: Any = None, select: Any = None, **col_preds: Any) -> Table:
    """Predicate filter (reference src/selection.jl:20-23).

    Forms:
      * ``filter_(t, F.col("x") > 3)`` — native Column predicate.
      * ``filter_(t, x=lambda c: c > 3, y=5)`` — per-column predicates,
        conjoined (reference tuple-of-`col=>pred` form,
        test/test_table.jl:227-235). A non-callable value means equality.
      * ``filter_(t, {1: f, "b": g})`` — selector-keyed predicates, for
        positional (1-based) keys the kwargs form can't express
        (reference test/test_query.jl:24-38).
      * ``filter_(t, python_callable, select="x")`` — row/selection closure
        (slow path: pandas_udf boolean).
    """
    conds: list[Column] = []
    if isinstance(pred, Column):
        conds.append(pred)
    elif isinstance(pred, str):
        conds.append(F.expr(pred))
    elif isinstance(pred, dict):
        for sel, p in pred.items():
            resolved = S.resolve(t.df, sel, t.pkey)
            if len(resolved) != 1:
                raise ValueError(f"filter predicate key {sel!r} must name "
                                 "one column")
            conds.append(_pred_cond(resolved[0][1], p))
    elif pred is not None and callable(pred):
        # NDSparse: a bare closure filters the VALUES by default
        # (reference test/test_table.jl:229 `filter(y->y<2, x)`)
        if select is None and isinstance(t, NDSparse):
            select = (t.valnames[0] if len(t.valnames) == 1
                      else tuple(t.valnames))
        sel_resolved = S.resolve(t.df, select, t.pkey)
        if len(sel_resolved) == 1:
            name, col = sel_resolved[0]
            out = None
            try:
                out = pred(col)
            except S._PROBE_ERRORS:
                out = None
            if isinstance(out, Column):
                conds.append(out)
            else:
                udf = F.pandas_udf(lambda s: s.map(pred), T.BooleanType())
                conds.append(udf(col))
        else:
            # whole-row closure (reference `filter(p->p.x/p.t<100, t)`,
            # test/test_table.jl:227-231): rows arrive as a pandas
            # DataFrame through a struct-typed Arrow batch; the closure
            # sees attribute-style rows (p.x, p.t)
            conds.append(_row_closure_udf(pred, sel_resolved,
                                          T.BooleanType()))
    for cname, p in col_preds.items():
        conds.append(_pred_cond(F.col(cname), p))
    df = t.df
    for c in conds:
        df = df.filter(c)
    return t._with(df)


def map_(f: Any, t: Table, select: Any = None, rtype: Any = None,
         name: str = "map") -> Table:
    """Row-wise function application (reference src/selection.jl:1-6).

    `f` over the selection; native Column math when possible, pandas_udf
    otherwise. For a Table: returns a 1-column table named `name` (or a
    multi-column table when `f` returns a dict of Columns — the
    named-tuple case, test/test_table.jl:31). For an NDSparse: the index
    is KEPT and `f` maps the value column(s), as in the reference
    (test/test_query.jl:1-6 `map(-, d)`).
    """
    is_nd = isinstance(t, NDSparse)
    if is_nd and select is None:
        select = t.valnames[0] if len(t.valnames) == 1 else tuple(t.valnames)
        if len(t.valnames) == 1:
            name = t.valnames[0]

    resolved = S.resolve(t.df, select, t.pkey)
    cols = [c for _, c in resolved]
    out = None
    try:
        out = f(*cols)
    except S._PROBE_ERRORS:
        out = None
    if isinstance(out, Column):
        mapped = [out.alias(name)]
    elif isinstance(out, dict) and all(isinstance(v, Column) for v in out.values()):
        mapped = [v.alias(k) for k, v in out.items()]
    else:
        # Slow path: pandas UDF over the selected columns.
        spark_rtype = rtype or T.DoubleType()
        if isinstance(spark_rtype, str):
            spark_rtype = T._parse_datatype_string(spark_rtype)
        if len(cols) == 1:
            udf = F.pandas_udf(lambda s: s.map(f), spark_rtype)
            mapped = [udf(cols[0]).alias(name)]
        else:
            import inspect
            try:
                sig = inspect.signature(f)
                n_params = len([p for p in sig.parameters.values()
                                if p.kind in (p.POSITIONAL_ONLY,
                                              p.POSITIONAL_OR_KEYWORD)])
            except (TypeError, ValueError):
                n_params = len(cols)
            if n_params == 1:
                # whole-row closure (reference `map(row->row.x+row.y, t)`,
                # test/test_table.jl:200-203); a struct rtype (e.g.
                # "r double, theta double") expands into columns — the
                # named-tuple result case
                mapped = [_row_closure_udf(f, resolved, spark_rtype)
                          .alias(name)]
            else:
                import pandas as pd

                def _apply(*series: "pd.Series") -> "pd.Series":
                    return pd.Series([f(*vals) for vals in zip(*series)])

                udf = F.pandas_udf(_apply, spark_rtype)
                mapped = [udf(*cols).alias(name)]
        if isinstance(spark_rtype, T.StructType):
            keys = list(t.pkey) if is_nd else []
            pre = t.df.select(*keys, *mapped)
            out_df = pre.select(*keys, F.col(name + ".*"))
            return (NDSparse(out_df, t.pkey, t.presorted) if is_nd
                    else Table(out_df, ()))
    if is_nd:
        return NDSparse(t.df.select(*t.pkey, *mapped), t.pkey, t.presorted)
    return Table(t.df.select(*mapped), ())


def transform(t: Table, **changes: Any) -> Table:
    """Add/replace columns (reference `transform`, test/test_table.jl:81-87).

    Values may be Columns, (selector, fn) pairs, or literals. Replacing a
    pkey column drops the presorted flag (the reference re-sorts;
    test/test_table.jl:83-85 — we re-sort lazily on demand)."""
    df = t.df
    touched_pkey = False
    for name, v in changes.items():
        if isinstance(v, S.Pair):
            resolved = S.resolve(df, v, t.pkey)
            col = resolved[0][1]
        elif isinstance(v, Column):
            col = v
        else:
            col = F.lit(v)
        df = df.withColumn(name, col)
        if name in t.pkey:
            touched_pkey = True
    return t._with(df, presorted=t.presorted and not touched_pkey)


def rename(t: Table, **mapping: str) -> Table:
    """Rename columns old=new (reference test/test_table.jl:96-97)."""
    df = t.df
    pkey = list(t.pkey)
    for old, new in mapping.items():
        df = df.withColumnRenamed(old, new)
        pkey = [new if k == old else k for k in pkey]
    return type(t)(df, tuple(pkey), t.presorted)


def _insert_at(t: Table, pos: int, name: str, col: Any) -> Table:
    cols = list(t.df.columns)
    expr = col if isinstance(col, Column) else F.lit(col)
    new_order = cols[:pos] + [name] + cols[pos:]
    df = t.df.withColumn(name, expr).select(*new_order)
    return t._with(df)


def insertcols(t: Table, pos: int, name: str, col: Any) -> Table:
    """Positional column insert, 1-based (reference test/test_table.jl:90-95)."""
    return _insert_at(t, pos - 1, name, col)


def insertcolsafter(t: Table, after: str, name: str, col: Any) -> Table:
    return _insert_at(t, t.df.columns.index(after) + 1, name, col)


def insertcolsbefore(t: Table, before: str, name: str, col: Any) -> Table:
    return _insert_at(t, t.df.columns.index(before), name, col)


def dropmissing(t: Table, sel: Any = None) -> Table:
    """Drop rows with nulls in all/selected cols (reference
    src/selection.jl:8-12; tests test/test_table.jl:203-222)."""
    names = S.resolve_names(t.df, sel, t.pkey) if sel is not None else None
    return t._with(t.df.na.drop(subset=names))


def convertmissing(t: Table, rep: str = "missing") -> Table:
    """Identity on Spark (reference src/selection.jl:14-18 converts between
    Missing and DataValue representations; Spark has a single null
    representation, so the duality collapses — documented divergence)."""
    return t


def mapchunks(f: Callable, t: Table, schema: Any = None) -> Table:
    """Apply `f` to each partition as a pandas DataFrame (reference
    `mapchunks`, src/ndsparse.jl:477-491) via Arrow-batched mapInPandas."""
    import pandas as pd

    def _apply(batches):
        for pdf in batches:
            out = f(pdf)
            yield out if isinstance(out, pd.DataFrame) else pd.DataFrame(out)

    out_schema = schema or t.df.schema
    return type(t)(t.df.mapInPandas(_apply, out_schema), t.pkey)


def selectkeys(nd: NDSparse, sel: Any, agg: Any = None) -> NDSparse:
    """Re-key an NDSparse by a subset of index cols (reference
    src/selection.jl:25-29); `agg` combines key collisions."""
    keynames = S.resolve_names(nd.df, sel, nd.pkey)
    keep = keynames + nd.valnames
    out = NDSparse(nd.df.select(*keep), tuple(keynames))
    if agg is not None:
        from juliadb_jl_spark.plans.table import ndsparse as _ndsparse
        return _ndsparse(out.df, tuple(keynames), agg=agg)
    return out


def selectvalues(nd: NDSparse, sel: Any) -> NDSparse:
    """Project value columns, keeping the index (reference
    src/selection.jl:31-34)."""
    val_resolved = S.resolve(nd.df.select(*nd.valnames), sel, ())
    cols = [F.col(k) for k in nd.pkey] + S.as_columns(val_resolved)
    return NDSparse(nd.df.select(*cols), nd.pkey, nd.presorted)


def convertdim(nd: NDSparse, dim: str | int, f: Any, agg: Any = None,
               vecagg: Any = None, rtype: Any = None) -> NDSparse:
    """Map one key dimension through a function/dict, aggregating
    many-to-one collisions (reference src/selection.jl:36-81;
    tests test/test_query.jl:45-59). `dim` may be a name or 1-based
    position."""
    if isinstance(dim, int):
        dim = nd.pkey[dim - 1]
    if isinstance(f, dict):
        mapping = F.create_map(*[F.lit(x) for kv in f.items() for x in kv])
        newdim = mapping[F.col(dim)]
    else:
        newdim = S._apply_fn(F.col(dim), f, rtype, dim)
    df = nd.df.withColumn(dim, newdim)
    out = NDSparse(df, nd.pkey)
    if agg is not None:
        from juliadb_jl_spark.plans.table import ndsparse as _ndsparse
        return _ndsparse(df, nd.pkey, agg=agg)
    if vecagg is not None:
        from juliadb_jl_spark.operators.reduce import groupby
        g = groupby(vecagg, out, by=nd.pkey)
        return NDSparse(g.df, nd.pkey)
    return out
