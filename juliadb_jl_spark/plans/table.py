"""Table / NDSparse — the two core abstractions, as DataFrame wrappers.

Reference model (SURVEY.md §1): `DIndexedTable{T,K}` is a pkey-sorted
relation (reference src/table.jl:21-27); `DNDSparse{K,V}` is a sorted
keys→values map (reference src/ndsparse.jl:12-15).  On Spark, both wrap a
DataFrame; the chunk-interval metadata the reference tracks by hand
(IndexSpace at src/table.jl:3-16) is subsumed by parquet row-group stats +
Catalyst, so the engine-side metadata is just the primary key and a
"sorted" flag used to pick `sortWithinPartitions` over global sorts and to
define positional semantics.
"""

from __future__ import annotations

from typing import Any, Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from juliadb_jl_spark.plans import selectors as S


class Table:
    """Pkey-sorted relational table (≙ reference DIndexedTable).

    Immutable: every operation returns a new Table (reference
    docs/src/basics.md:15-16 — "JuliaDB has few mutating operations").
    """

    def __init__(self, df: DataFrame, pkey: Sequence[str] | str = (),
                 presorted: bool = False):
        if isinstance(pkey, str):
            pkey = (pkey,)
        missing = [k for k in pkey if k not in df.columns]
        if missing:
            raise KeyError(f"pkey columns {missing} not in {df.columns}")
        self.df = df
        self.pkey: tuple[str, ...] = tuple(pkey)
        # "presorted" means partitions are already range-partitioned +
        # locally sorted on pkey, so downstream merge/positional ops can
        # skip the global sort (reference presorted flags src/sort.jl:33-46).
        self.presorted = presorted

    # -- introspection ----------------------------------------------------
    @property
    def columns(self) -> list[str]:
        return self.df.columns

    @property
    def valnames(self) -> list[str]:
        pk = set(self.pkey)
        return [c for c in self.df.columns if c not in pk]

    def schema(self):
        return self.df.schema

    def __repr__(self) -> str:
        kind = type(self).__name__
        return f"{kind}(pkey={list(self.pkey)}, columns={self.columns})"

    # -- re-wrap helpers ---------------------------------------------------
    def _with(self, df: DataFrame, pkey: Sequence[str] | None = None,
              presorted: bool | None = None) -> "Table":
        return type(self)(
            df,
            self.pkey if pkey is None else pkey,
            self.presorted if presorted is None else bool(presorted),
        )

    # -- materialization (reference §1.5) ----------------------------------
    def compute(self) -> "Table":
        """Materialize and keep distributed (reference `compute`,
        src/table.jl:192-202) → cache + force."""
        self.df.cache()
        self.df.count()
        return self

    def head(self, n: int = 5) -> pd.DataFrame:
        return self._ordered_df().limit(n).toPandas()

    def collect(self) -> pd.DataFrame:
        """Merge to one local table (reference `collect`,
        src/table.jl:206-215). Ordered by pkey so results are deterministic."""
        return self._ordered_df().toPandas()

    def _ordered_df(self) -> DataFrame:
        if self.pkey:
            return self.df.orderBy(*[F.col(k).asc_nulls_last() for k in self.pkey])
        return self.df

    def count(self) -> int:
        return self.df.count()

    def __len__(self) -> int:
        return self.count()

    # -- distribution ------------------------------------------------------
    def distribute(self, chunks: int) -> "Table":
        """Repartition into `chunks` partitions (reference `distribute`,
        src/table.jl:185-190). Range-partition on pkey when sorted semantics
        should hold, else round-robin."""
        if self.pkey:
            df = (self.df.repartitionByRange(chunks, *self.pkey)
                  .sortWithinPartitions(*self.pkey))
            return self._with(df, presorted=True)
        return self._with(self.df.repartition(chunks), presorted=False)

    # -- positional access (defined on sorted tables; SURVEY §7.5.4) -------
    def __getitem__(self, i: int) -> dict:
        if i == 1:
            row = self._ordered_df().head(1)
        elif i == -1:
            row = self._ordered_df().tail(1)
        else:
            raise IndexError("only t[1] / t[-1] positional access is supported")
        if not row:
            raise IndexError("empty table")
        return row[0].asDict()

    # -- deconstruction (reference src/iteration.jl:125-246) ---------------
    def column(self, sel) -> "pd.Series":
        """One column as a pkey-ordered pandas Series, by name or 1-based
        position (reference `column`, test/test_iteration.jl:5-9)."""
        from juliadb_jl_spark.plans import selectors as S
        names = S.resolve_names(self.df, sel, self.pkey)
        if len(names) != 1:
            raise ValueError(f"column() needs exactly one column, got {names}")
        keep = list(dict.fromkeys(list(self.pkey) + names))
        sub = Table(self.df.select(*keep), self.pkey, self.presorted)
        return sub.collect()[names[0]]

    def columns_dict(self, sel=None) -> dict[str, "pd.Series"]:
        """Materialize as {name: column}; optional selector restricts the
        columns (reference `columns(x, (:a, :c))`)."""
        from juliadb_jl_spark.plans import selectors as S
        pdf = self.collect()
        names = (S.resolve_names(self.df, sel, self.pkey) if sel is not None
                 else list(pdf.columns))
        return {c: pdf[c] for c in names}

    def rows(self):
        """Iterate rows as dicts in pkey order (reference `rows`)."""
        for row in self._ordered_df().toLocalIterator():
            yield row.asDict()

    def keys_(self, sel=None) -> "pd.DataFrame":
        """The pkey columns; a selector (name or 1-based position within
        the keys) restricts them (reference `keys(x, :a)`)."""
        pdf = type(self)(self.df.select(*self.pkey), self.pkey).collect()
        if sel is None:
            return pdf
        from juliadb_jl_spark.plans import selectors as S
        return pdf[S.resolve_names(self.df.select(*self.pkey), sel, self.pkey)]

    def values_(self, sel=None) -> "pd.DataFrame":
        """The value columns in pkey order; a selector (name or 1-based
        position within the values) restricts them (reference
        `values(x, 1)`)."""
        full = self.collect()
        names = list(self.valnames)
        if sel is not None:
            from juliadb_jl_spark.plans import selectors as S
            names = S.resolve_names(self.df.select(*self.valnames), sel, ())
        return full[names]

    def pairs(self):
        """Iterate (key_tuple, value_dict) in pkey order (reference `pairs`)."""
        pk = set(self.pkey)
        for row in self._ordered_df().toLocalIterator():
            d = row.asDict()
            yield (tuple(d[k] for k in self.pkey),
                   {k: v for k, v in d.items() if k not in pk})

    # -- fluent method API (delegates to the operator functions) -----------
    def select(self, sel):
        from juliadb_jl_spark.operators.selection import select as _f
        return _f(self, sel)

    def filter(self, pred=None, select=None, **col_preds):
        from juliadb_jl_spark.operators.selection import filter_ as _f
        return _f(self, pred, select, **col_preds)

    def transform(self, **changes):
        from juliadb_jl_spark.operators.selection import transform as _f
        return _f(self, **changes)

    def rename(self, **mapping):
        from juliadb_jl_spark.operators.selection import rename as _f
        return _f(self, **mapping)

    def groupby(self, f, by, **kw):
        from juliadb_jl_spark.operators.reduce import groupby as _f
        return _f(f, self, by, **kw)

    def groupreduce(self, f, by, **kw):
        from juliadb_jl_spark.operators.reduce import groupreduce as _f
        return _f(f, self, by, **kw)

    def reduce(self, f, select=None):
        from juliadb_jl_spark.operators.reduce import reduce_ as _f
        return _f(f, self, select)

    def summarize(self, f, by, **kw):
        from juliadb_jl_spark.operators.reduce import summarize as _f
        return _f(f, self, by, **kw)

    def join(self, other, **kw):
        from juliadb_jl_spark.operators.join import join as _f
        return _f(self, other, **kw)

    def groupjoin(self, other, **kw):
        from juliadb_jl_spark.operators.join import groupjoin as _f
        return _f(self, other, **kw)

    def asofjoin(self, other, **kw):
        from juliadb_jl_spark.operators.join import asofjoin as _f
        return _f(self, other, **kw)

    def merge(self, other, agg=None):
        from juliadb_jl_spark.operators.join import merge as _f
        return _f(self, other, agg)

    def sort(self, by=None, **kw):
        from juliadb_jl_spark.operators.sort import sort as _f
        return _f(self, by, **kw)

    def reindex_by(self, pkey):
        from juliadb_jl_spark.operators.sort import reindex as _f
        return _f(self, pkey)

    def stack(self, sel=None, **kw):
        from juliadb_jl_spark.operators.reshape import stack as _f
        return _f(self, sel, **kw)

    def unstack(self, **kw):
        from juliadb_jl_spark.operators.reshape import unstack as _f
        return _f(self, **kw)

    def flatten(self, col):
        from juliadb_jl_spark.operators.reshape import flatten as _f
        return _f(self, col)

    def dropmissing(self, sel=None):
        from juliadb_jl_spark.operators.selection import dropmissing as _f
        return _f(self, sel)

    def save(self, path, **kw):
        from juliadb_jl_spark.sources.parquet import save as _f
        return _f(self, path, **kw)

    def view(self, name: str) -> "Table":
        """Register as a temp view for `spark.sql` — SQL surface the
        reference lacks; free on Spark (parity+)."""
        self.df.createOrReplaceTempView(name)
        return self

    # -- equality (reference src/JuliaDB.jl:46-64) --------------------------
    def same_rows(self, other: "Table") -> bool:
        a, b = self.df, other.df
        if set(a.columns) != set(b.columns):
            return False
        b = b.select(*a.columns)
        return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


class NDSparse(Table):
    """Sorted keys→values map with array-like lookups (≙ DNDSparse).

    The pkey columns are the index dimensions; lookups become filters
    (reference src/indexing.jl:11-44).
    """

    @property
    def dimnames(self) -> list[str]:
        return list(self.pkey)

    def __getitem__(self, key: Any) -> Any:
        """Point lookup t[k...] (KeyError if absent) or slice t[a:b, :].

        Ref: src/indexing.jl:11-44; tests test/test_query.jl:8-21.
        """
        if not isinstance(key, tuple):
            key = (key,)
        if len(key) != len(self.pkey):
            raise KeyError(f"expected {len(self.pkey)} index values, got {len(key)}")
        conds, point = [], True
        for dim, k in zip(self.pkey, key):
            if isinstance(k, slice):
                point = False
                if k.start is not None:
                    conds.append(F.col(dim) >= k.start)
                if k.stop is not None:
                    conds.append(F.col(dim) <= k.stop)
            elif k is Ellipsis:
                point = False
            else:
                conds.append(F.col(dim) == k)
        df = self.df
        for c in conds:
            df = df.filter(c)
        if point:
            rows = df.head(2)
            if not rows:
                raise KeyError(f"key {key} not found")
            vals = {c: rows[0][c] for c in self.valnames}
            return vals[self.valnames[0]] if len(self.valnames) == 1 else vals
        return NDSparse(df, self.pkey, self.presorted)

    def set_value(self, key: tuple, **values: Any) -> "NDSparse":
        """Immutable analogue of reference `setindex!` (src/indexing.jl:47-86):
        returns a NEW NDSparse with the row for `key` inserted/updated.
        Documented semantic divergence: no in-place mutation on Spark.
        """
        spark = self.df.sparkSession
        rowdict = dict(zip(self.pkey, key))
        rowdict.update(values)
        new = spark.createDataFrame([rowdict], schema=self.df.schema)
        tag_old = self.df.withColumn("__src", F.lit(0))
        tag_new = new.withColumn("__src", F.lit(1))
        unioned = tag_old.unionByName(tag_new)
        from pyspark.sql import Window as W
        w = W.partitionBy(*self.pkey).orderBy(F.col("__src").desc())
        deduped = (unioned.withColumn("__rn", F.row_number().over(w))
                   .filter(F.col("__rn") == 1).drop("__rn", "__src"))
        return NDSparse(deduped, self.pkey, presorted=False)


# ---------------------------------------------------------------------------
# Constructors (reference `table` docs/src/basics.md:34-41, `ndsparse` :43-57)
# ---------------------------------------------------------------------------

def table(data: Any, pkey: Sequence[str] | str = (), spark: SparkSession | None = None,
          chunks: int | None = None) -> Table:
    """Build a Table from a DataFrame, pandas DataFrame, or dict of columns."""
    df = _to_spark_df(data, spark)
    t = Table(df, pkey)
    if chunks:
        t = t.distribute(chunks)
    return t


def ndsparse(data: Any, indexcols: Sequence[str] | str, spark: SparkSession | None = None,
             agg: Any = None, chunks: int | None = None) -> NDSparse:
    """Build an NDSparse keyed on `indexcols`; duplicate keys combined with
    `agg` when given (reference src/ndsparse.jl:19-78)."""
    df = _to_spark_df(data, spark)
    if isinstance(indexcols, str):
        indexcols = (indexcols,)
    nd = NDSparse(df, tuple(indexcols))
    if agg is not None:
        from juliadb_jl_spark.operators.reduce import groupreduce
        red = groupreduce(agg, nd, by=tuple(indexcols))
        # groupreduce returns a Table; re-wrap and restore value column names.
        rename_map = dict(zip(red.valnames, nd.valnames))
        out = red.df
        for old, new in rename_map.items():
            out = out.withColumnRenamed(old, new)
        nd = NDSparse(out, tuple(indexcols))
    if chunks:
        nd = nd.distribute(chunks)
    return nd


def _to_spark_df(data: Any, spark: SparkSession | None) -> DataFrame:
    if isinstance(data, Table):
        return data.df
    if isinstance(data, DataFrame):
        return data
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise ValueError("pass spark= when building from local data")
    if isinstance(data, pd.DataFrame):
        return spark.createDataFrame(data)
    if isinstance(data, dict):
        return spark.createDataFrame(pd.DataFrame(data))
    if isinstance(data, Iterable):
        return spark.createDataFrame(list(data))
    raise TypeError(f"cannot build a Table from {type(data)}")
