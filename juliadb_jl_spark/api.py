"""Free-function export parity with the reference's top-level API
(reference src/JuliaDB.jl:27-37 export list): deconstruction functions,
ColDict column editing, and Dagger-surface analogues (compute /
distribute / chunks / rechunk_together). Everything here is a thin,
documented veneer over the Table/NDSparse methods and operators — the
semantics live there; this module only restores the reference's
free-function calling convention."""

from __future__ import annotations

from glob import glob  # noqa: F401  (reference re-exports Glob.glob)
from typing import Any, Sequence

from pyspark.sql import Column, functions as F

from juliadb_jl_spark.operators.sort import with_global_rownum
from juliadb_jl_spark.plans.table import NDSparse, Table


# ---------------------------------------------------------------------------
# Deconstruction (reference column/columns/rows/pairs/colnames)
# ---------------------------------------------------------------------------

def colnames(t: Table) -> list[str]:
    return list(t.df.columns)


def column(t: Table, sel):
    """One column as a pandas Series (driver-side materialization, like
    the reference's `column(t, sel)` which realizes a vector)."""
    return t.column(sel)


def columns(t: Table, sel=None):
    """Dict of column name → pandas Series (reference `columns`)."""
    return t.columns_dict(sel)


def rows(t: Table, sel=None):
    """Row tuples of the (optional) selection (reference `rows`)."""
    return (t if sel is None else t.select(sel)).rows()


def pairs(t: NDSparse):
    """(key, value) pairs of an NDSparse (reference `pairs`)."""
    return t.pairs()


def keys_(t: NDSparse, sel=None):
    return t.keys_(sel)


def values_(t: NDSparse, sel=None):
    return t.values_(sel)


# ---------------------------------------------------------------------------
# Dagger-surface analogues
# ---------------------------------------------------------------------------

def compute(t: Table) -> Table:
    """Materialize the plan (reference `compute` forces the Dagger DAG):
    persists and triggers evaluation; downstream reads reuse the
    materialized result."""
    return t.compute()


def distribute(t: Table, chunks: int) -> Table:
    """Repartition into `chunks` chunks (reference `distribute`)."""
    return t.distribute(chunks)


def chunks(t: Table) -> int:
    """Number of chunks/partitions of the current plan (reference
    `chunks` returns the Dagger chunk vector; partition count is the
    Spark analogue)."""
    return t.df.rdd.getNumPartitions()


def rechunk_together(l: Table, r: Table, by: Sequence[str] | str | None = None,
                     chunks: int | None = None) -> tuple[Table, Table]:
    """Co-partition two tables identically on the join key (reference
    `rechunk_together`, src/join.jl:330-342) so repeated joins between
    them shuffle neither side again: both sides are hash-partitioned by
    the same keys into the same partition count, which Catalyst
    recognizes as co-partitioning and reuses across joins."""
    keys = ([by] if isinstance(by, str) else list(by or l.pkey))
    if not keys:
        raise ValueError("rechunk_together needs join keys (by= or pkey)")
    n = chunks or l.df.sparkSession.sparkContext.defaultParallelism
    return (l._with(l.df.repartition(n, *keys)),
            r._with(r.df.repartition(n, *keys)))


# ---------------------------------------------------------------------------
# ColDict — accumulate column edits, then build (reference ColDict,
# exports insertafter!/insertbefore!)
# ---------------------------------------------------------------------------

class ColDict:
    """Column-editing accumulator: `d = ColDict(t); d["x"] = expr;
    d.insertafter("x", "y", ...); t2 = d.done()`. Values may be Column
    expressions, scalars, or Python sequences — sequences are assigned
    positionally in pkey order (load order without a pkey) via the
    scale-safe two-pass global rownum, mirroring the reference's
    vector-assignment semantics (the sequence must have exactly one
    value per row)."""

    def __init__(self, t: Table):
        self._t = t

    def __getitem__(self, name: str) -> Column:
        return F.col(name)

    def _coerce(self, name: str, value: Any) -> Table:
        t = self._t
        if isinstance(value, Column):
            return t._with(t.df.withColumn(name, value))
        if isinstance(value, (list, tuple)) or hasattr(value, "__len__") \
                and not isinstance(value, str):
            return self._set_vector(name, list(value))
        return t._with(t.df.withColumn(name, F.lit(value)))

    def _set_vector(self, name: str, seq: list) -> Table:
        t = self._t
        n = t.count()
        if len(seq) != n:
            raise ValueError(f"sequence has {len(seq)} values for {n} rows")
        spark = t.df.sparkSession
        order = [F.col(k) for k in t.pkey] if t.pkey else None
        base = with_global_rownum(t.df, "__rn", order=order)
        vals = spark.createDataFrame(
            [(i + 1, v) for i, v in enumerate(seq)], ["__rn", "__newval"])
        cols = list(t.df.columns)
        if name not in cols:
            cols.append(name)
        joined = (base.drop(name) if name in base.columns else base) \
            .join(F.broadcast(vals), "__rn", "left") \
            .withColumnRenamed("__newval", name)
        return t._with(joined.select(*cols))

    def __setitem__(self, name: str, value: Any) -> None:
        self._t = self._coerce(name, value)

    def __delitem__(self, name: str) -> None:
        t = self._t
        if name in t.pkey:
            raise ValueError(f"cannot drop pkey column {name}")
        self._t = t._with(t.df.drop(name))

    def rename(self, old: str, new: str) -> None:
        from juliadb_jl_spark.operators.selection import rename as _rn
        self._t = _rn(self._t, **{old: new})

    def insertafter(self, after: str, name: str, value: Any) -> None:
        edited = self._coerce(name, value)
        cols = [c for c in edited.df.columns if c != name]
        pos = cols.index(after) + 1
        self._t = edited._with(
            edited.df.select(*cols[:pos], name, *cols[pos:]))

    def insertbefore(self, before: str, name: str, value: Any) -> None:
        edited = self._coerce(name, value)
        cols = [c for c in edited.df.columns if c != name]
        pos = cols.index(before)
        self._t = edited._with(
            edited.df.select(*cols[:pos], name, *cols[pos:]))

    def done(self) -> Table:
        return self._t


def Columns(*args: Any, **kw: Any):
    """Reference `Columns(...)` constructor shim: named form → a dict of
    column vectors, positional form → a tuple; both are accepted by
    `table(...)`/`ndsparse(...)` as columnar data."""
    if args and kw:
        raise ValueError("Columns takes either positional or named vectors")
    return dict(kw) if kw else tuple(args)
