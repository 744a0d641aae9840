"""Reshaping operators: stack / unstack / flatten / mapslices.

Reference: JuliaDB src/reshape.jl (stack/unstack) and src/flatten.jl
(flatten/mapslices).  stack lowers to Spark's native `stack()` expression
(one pass, no shuffle); unstack to groupBy().pivot() with an explicit
value list when known (avoids the extra distinct-scan job).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

from pyspark.sql import functions as F

from juliadb_jl_spark.plans import selectors as S
from juliadb_jl_spark.plans.table import NDSparse, Table


def stack(t: Table, sel: Any = None, variable: str = "variable",
          value: str = "value") -> Table:
    """Wide→long (reference src/reshape.jl:1-9; test test/test_table.jl:168-173):
    fold the selected value columns into (variable, value) pairs, repeating
    the key columns."""
    val_names = S.resolve_names(t.df, sel, t.pkey) if sel is not None else t.valnames
    keep = [c for c in t.df.columns if c not in set(val_names)]
    pairs = ", ".join(f"'{c}', `{c}`" for c in val_names)
    expr = f"stack({len(val_names)}, {pairs}) as (`{variable}`, `{value}`)"
    out = t.df.select(*keep, F.expr(expr))
    return Table(out, t.pkey)


def unstack(t: Table, variable: str = "variable", value: str = "value",
            values: Sequence[str] | None = None) -> Table:
    """Long→wide pivot (reference src/reshape.jl:11-26; test
    test/test_table.jl:174). Missing combinations become nulls.  Pass
    `values` (the distinct variable names) when known to skip the extra
    distinct job — at 100 TB that scan matters."""
    keys = [c for c in t.df.columns if c not in {variable, value}]
    g = t.df.groupBy(*keys)
    piv = g.pivot(variable, list(values)) if values else g.pivot(variable)
    out = piv.agg(F.first(value))
    return Table(out, tuple(keys))


def flatten(t: Table, col: str | int) -> Table:
    """Explode a vector- or struct-array column, repeating other columns
    (reference src/flatten.jl:28-30; tests test/test_query.jl:109-118).
    `col` may be a name or 1-based position (`flatten(x, 2)`)."""
    if isinstance(col, int):
        col = t.df.columns[col - 1]
    dtype = t.df.schema[col].dataType
    from pyspark.sql import types as T
    if isinstance(dtype, T.ArrayType) and isinstance(dtype.elementType, T.StructType):
        others = [c for c in t.df.columns if c != col]
        out = t.df.select(*others, F.inline(F.col(col)))
    else:
        out = t.df.withColumn(col, F.explode(F.col(col)))
    return Table(out, t.pkey)


def mapslices(f: Callable, nd: NDSparse, dims: Sequence[str] | str,
              schema: str | None = None) -> NDSparse:
    """Apply `f` to each slice along the trailing `dims` (reference
    src/flatten.jl:1-26; tests test/test_query.jl:92-107): group by the
    leading dims, hand each group (as pandas) to `f`, which may return a
    frame (re-keyed flatmap). Arrow-batched applyInPandas."""
    if isinstance(dims, str):
        dims = (dims,)
    leading = [d for d in nd.pkey if d not in set(dims)]
    from juliadb_jl_spark.operators.reduce import groupby
    g = groupby(f, nd, by=tuple(leading),
                select=tuple([d for d in nd.pkey if d in set(dims)] + nd.valnames),
                schema=schema)
    return NDSparse(g.df, tuple(leading))
