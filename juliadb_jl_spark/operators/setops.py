"""Set operations.

The reference only has union-like `merge` (SURVEY.md §2.7); Spark gives
intersect/except for free — exposed for surface parity+.
"""

from __future__ import annotations

from juliadb_jl_spark.plans.table import Table


def union_(l: Table, r: Table, distinct: bool = False) -> Table:
    out = l.df.unionByName(r.df, allowMissingColumns=True)
    if distinct:
        out = out.distinct()
    return Table(out, l.pkey)


def intersect_(l: Table, r: Table, all: bool = False) -> Table:
    out = l.df.intersectAll(r.df) if all else l.df.intersect(r.df)
    return Table(out, l.pkey)


def except_(l: Table, r: Table, all: bool = True) -> Table:
    out = l.df.exceptAll(r.df) if all else l.df.subtract(r.df)
    return Table(out, l.pkey)


def distinct_(t: Table) -> Table:
    return t._with(t.df.distinct())
