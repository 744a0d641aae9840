"""Join operators: inner/left/outer/anti, groupjoin, asofjoin, merge,
NDSparse natural/left/broadcast joins.

Reference: JuliaDB src/join.jl.  The reference hand-implements exactly the
two strategies Catalyst picks automatically — co-range-partitioned merge
join (rechunk_together, src/join.jl:3-24) and broadcast join
(src/join.jl:37-57) — so every equi-join here is a plain `DataFrame.join`
and we only add option/semantics translation.  `asofjoin` is the one
operator Spark lacks natively; it lowers to union + last-ignorenulls
window, a single shuffle on the equality keys (no row explosion, skew-safe
at scale).
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from juliadb_jl_spark.plans import selectors as S
from juliadb_jl_spark.plans.table import NDSparse, Table

_HOW = {
    "inner": "inner", "left": "left", "outer": "full", "anti": "left_anti",
    "semi": "left_semi", "cross": "cross",
}


def _keys_of(t: Table, key: Any) -> list[str]:
    if key is None:
        if not t.pkey:
            raise ValueError("no pkey and no join key given")
        return list(t.pkey)
    return S.resolve_names(t.df, key, t.pkey)


def join(l: Table, r: Table, how: str = "inner", lkey: Any = None,
         rkey: Any = None, lselect: Any = None, rselect: Any = None,
         broadcast: str | None = None) -> Table:
    """Equi-join on lkey/rkey (default: pkeys) with optional projections
    (reference src/join.jl:26-118; tests test/test_table.jl:98-116).

    Duplicate keys produce the cartesian of matches, as in the reference
    (test/test_table.jl:110-112) — standard SQL join semantics.
    `broadcast="right"` applies the broadcast hint (reference
    src/join.jl:37-57; the documented big⋈small out-of-core join).
    Overlapping non-key right columns are suffixed `_1`.
    """
    lk, rk = _keys_of(l, lkey), _keys_of(r, rkey)
    if len(lk) != len(rk):
        raise ValueError(f"key arity mismatch: {lk} vs {rk}")

    ldf = l.df if lselect is None else l.df.select(
        *dict.fromkeys(lk + S.resolve_names(l.df, lselect, l.pkey)))
    rdf = r.df if rselect is None else r.df.select(
        *dict.fromkeys(rk + S.resolve_names(r.df, rselect, r.pkey)))

    # Align right key names to left's so the join emits one key column set.
    for a, b in zip(lk, rk):
        if a != b:
            rdf = rdf.withColumnRenamed(b, a)
    # Disambiguate overlapping non-key columns (suffix _1, right side).
    overlap = (set(ldf.columns) & set(rdf.columns)) - set(lk)
    for c in overlap:
        rdf = rdf.withColumnRenamed(c, f"{c}_1")

    if broadcast == "right":
        rdf = F.broadcast(rdf)
    elif broadcast == "left":
        ldf = F.broadcast(ldf)

    sp_how = _HOW[how]
    out = ldf.join(rdf, on=lk, how=sp_how)
    return Table(out, tuple(lk))


def groupjoin(l: Table, r: Table, how: str = "inner", lkey: Any = None,
              rkey: Any = None, rselect: Any = None) -> Table:
    """Join with matches collected into a nested `groups` array-of-struct
    column per key (reference src/join.jl:120-126; test
    test/test_table.jl:117-122). `how="left"` keeps unmatched left keys
    with an empty groups array."""
    lk, rk = _keys_of(l, lkey), _keys_of(r, rkey)
    rdf = r.df if rselect is None else r.df.select(
        *dict.fromkeys(rk + S.resolve_names(r.df, rselect, r.pkey)))
    for a, b in zip(lk, rk):
        if a != b:
            rdf = rdf.withColumnRenamed(b, a)
    vals = [c for c in rdf.columns if c not in lk]
    grouped = (rdf.groupBy(*lk)
               .agg(F.array_sort(F.collect_list(F.struct(*vals))).alias("groups")))
    out = l.df.join(grouped, on=lk, how="inner" if how == "inner" else "left")
    if how != "inner":
        empty = F.array().cast(grouped.schema["groups"].dataType)
        out = out.withColumn("groups", F.coalesce(F.col("groups"), empty))
    return Table(out, tuple(lk))


def asofjoin(l: Table, r: Table, by: Any, on: str, rselect: Any = None,
             tolerance: Any = None, suffix: str = "_asof") -> Table:
    """As-of join: for each left row, the right row with the greatest `on`
    value ≤ the left's, within equal `by` keys (reference src/join.jl:232-243;
    tests test/test_join.jl:32-43).

    Spark-native plan: tag sides → unionByName → one window over
    (partitionBy=by, orderBy=(on, side)) with last(..., ignorenulls=True)
    → keep left rows.  One shuffle on `by`, no range-explosion; at 100 TB
    this beats a range join because state per key is O(1) in the window.

    Right rows at exactly-equal `on` sort before left rows, so an equal
    timestamp matches (≤ semantics).  If multiple right rows share
    (by, on), the later row in (on) order wins; pre-aggregate the right
    side for full determinism.
    """
    by_names = _keys_of(l, by)
    rvals = S.resolve_names(r.df, rselect, r.pkey) if rselect is not None else \
        [c for c in r.df.columns if c not in set(by_names) | {on}]

    rdf = r.df.select(*by_names, on, *rvals)
    # Suffix right value columns that collide with left ones.
    renames = {}
    for c in rvals:
        target = f"{c}{suffix}" if c in l.df.columns else c
        renames[c] = target
        if target != c:
            rdf = rdf.withColumnRenamed(c, target)
    rnames = [renames[c] for c in rvals]

    lt = l.df.withColumn("__side", F.lit(1))
    for c in rnames:
        lt = lt.withColumn(c, F.lit(None).cast(rdf.schema[c].dataType))
    rt = rdf.withColumn("__side", F.lit(0))
    for c in l.df.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(l.df.schema[c].dataType))
    unioned = lt.unionByName(rt.select(*lt.columns))

    w = (W.partitionBy(*by_names)
         .orderBy(F.col(on).asc(), F.col("__side").asc())
         .rowsBetween(W.unboundedPreceding, 0))
    filled = unioned
    for c in rnames:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    if tolerance is not None:
        ron = F.last(F.when(F.col("__side") == 0, F.col(on)),
                     ignorenulls=True).over(w)
        filled = filled.withColumn("__ron", ron)
        for c in rnames:
            filled = filled.withColumn(
                c, F.when(F.col(on) - F.col("__ron") <= tolerance, F.col(c)))
        filled = filled.drop("__ron")
    out = filled.filter(F.col("__side") == 1).drop("__side")
    return Table(out, tuple(by_names) + (on,) if on not in by_names else tuple(by_names))


def innerjoin(l: Table, r: Table, **kw: Any) -> Table:
    """Alias of join(how="inner") (reference export `innerjoin`)."""
    kw.pop("how", None)
    return join(l, r, how="inner", **kw)


def salted_join(l: Table, r: Table, on: Sequence[str] | str, how: str = "inner",
                salt: int = 16) -> Table:
    """Skew-guard equi-join: replicate the (small-ish) right side `salt`
    times and scatter the left's hot keys across salt buckets, so one hot
    key spreads over `salt` reducers instead of one straggler task.
    AQE's skew-join handles moderate skew automatically; this is the
    explicit version for pathological keys (one key = 10% of 100 TB).
    Same result set as a plain equi-join."""
    if isinstance(on, str):
        on = [on]
    ldf = l.df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    rdf = r.df.withColumn("__salt", F.explode(F.array(
        *[F.lit(i) for i in range(salt)])))
    out = ldf.join(rdf, [*on, "__salt"], _HOW[how]).drop("__salt")
    return Table(out, tuple(on))


def range_join(l: Table, r: Table, on: Sequence[str] | str,
               l_col: str, r_col: str, lower: float, upper: float,
               bucket: float | None = None) -> Table:
    """Range join: rows where ``lower <= l.l_col - r.r_col <= upper``
    within equal `on` keys, WITHOUT a cross join.

    Spark has no native range join (the SURVEY §2.3 theta-join gap); the
    scale path is bucketization: each side is tagged with buckets of width
    `bucket` (default: the range width), the right side replicated into
    the (constant ≤ ⌈(upper-lower)/bucket⌉+1) buckets it can match, and
    the range predicate applied after an equi-join on (keys, bucket) —
    fanout is per-bucket, never |L|×|R|.  Numeric or timestamp-seconds
    columns."""
    if isinstance(on, str):
        on = [on]
    width = float(upper - lower)
    if width < 0:
        raise ValueError("upper must be >= lower")
    bucket = float(bucket or (width if width > 0 else 1.0))
    lv = F.col(l_col).cast("double")
    rv = F.col(r_col).cast("double")
    ldf = l.df.withColumn("__b", F.floor(lv / bucket).cast("long"))
    # right row with value v matches left values in [v+lower, v+upper] →
    # replicate into every bucket that window overlaps
    n_rep = int(width // bucket) + 2
    rdf = (r.df.withColumn(
        "__b0", F.floor((rv + F.lit(lower)) / bucket).cast("long"))
        .withColumn("__b", F.explode(F.array(
            *[F.col("__b0") + i for i in range(n_rep)])))
        .filter(F.col("__b") <= F.floor((rv + F.lit(upper)) / bucket))
        .drop("__b0"))
    overlap = (set(ldf.columns) & set(rdf.columns)) - set(on) - {"__b"}
    for c in overlap:
        rdf = rdf.withColumnRenamed(c, f"{c}_1")
    rcol_out = f"{r_col}_1" if r_col in overlap else r_col
    diff = lv - F.col(rcol_out).cast("double")
    out = (ldf.join(rdf, [*on, "__b"])
           .filter((diff >= lower) & (diff <= upper))
           .drop("__b"))
    return Table(out, tuple(on))


def naturaljoin(op: Any, l: NDSparse, r: NDSparse) -> NDSparse:
    """NDSparse inner join on the common index space, combining matched
    values with `op` (reference src/join.jl:138-187)."""
    common = [d for d in l.pkey if d in set(r.pkey)]
    return _nd_value_join(op, l, r, common, how="inner")


def leftjoin(op: Any, l: NDSparse, r: NDSparse) -> NDSparse:
    """NDSparse left join (reference src/join.jl:192-230): unmatched left
    keys keep their value (op applied only where both sides present)."""
    common = [d for d in l.pkey if d in set(r.pkey)]
    return _nd_value_join(op, l, r, common, how="left")


def _nd_value_join(op: Any, l: NDSparse, r: NDSparse, on: list[str],
                   how: str) -> NDSparse:
    lval, rval = l.valnames[0], r.valnames[0]
    rdf = r.df.select(*on, F.col(rval).alias("__rv"))
    joined = l.df.join(rdf, on=on, how=how)
    combined = _combine_expr(op, F.col(lval), F.col("__rv"))
    if how == "left":
        combined = F.when(F.col("__rv").isNull(), F.col(lval)).otherwise(combined)
    out = joined.withColumn(lval, combined).drop("__rv")
    return NDSparse(out, l.pkey)


def _combine_expr(op: Any, a: Column, b: Column) -> Column:
    if isinstance(op, str):
        return {"+": a + b, "-": a - b, "*": a * b, "/": a / b,
                "left": a, "right": b, "min": F.least(a, b),
                "max": F.greatest(a, b)}[op]
    out = op(a, b)
    if not isinstance(out, Column):
        raise TypeError("NDSparse join op must compile to a Column; "
                        "wrap Python closures in a pandas_udf explicitly")
    return out


def merge(l: Table, r: Table, agg: Any = None) -> Table:
    """Ordered union preserving pkey-sorted semantics (reference
    src/join.jl:264-267).  For NDSparse, colliding keys are combined with
    `agg`; default right-wins (reference src/join.jl:245-262)."""
    out = l.df.unionByName(r.df, allowMissingColumns=True)
    if isinstance(l, NDSparse):
        if agg is None:
            # right-wins: tag sides, keep the last by (side) per key
            tagged = (l.df.withColumn("__side", F.lit(0))
                      .unionByName(r.df.withColumn("__side", F.lit(1)),
                                   allowMissingColumns=True))
            w = W.partitionBy(*l.pkey).orderBy(F.col("__side").desc())
            deduped = (tagged.withColumn("__rn", F.row_number().over(w))
                       .filter(F.col("__rn") == 1).drop("__rn", "__side"))
            return NDSparse(deduped, l.pkey)
        from juliadb_jl_spark.plans.table import ndsparse as _ndsparse
        return _ndsparse(out, l.pkey, agg=agg)
    return Table(out, l.pkey, presorted=False)


def broadcast_nd(f: Any, a: NDSparse, b: NDSparse,
                 dimmap: Sequence[str] | None = None) -> NDSparse:
    """Dimension-aligned broadcast join (reference src/join.jl:269-324):
    match B's dims to a subset of A's (by name, or explicit `dimmap` naming
    A-dims in B-dim order), inner-join on them, apply `f` elementwise.
    The lower-dimensional side is naturally broadcast-able — hint it."""
    if dimmap is None:
        common = [d for d in a.pkey if d in set(b.pkey)]
        if not common:
            raise ValueError("no common dimensions; pass dimmap=")
        bsel = common
    else:
        common = list(dimmap)
        bsel = list(b.pkey)
    aval, bval = a.valnames[0], b.valnames[0]
    bdf = b.df.select(*[F.col(bd).alias(ad) for bd, ad in zip(bsel, common)],
                      F.col(bval).alias("__bv"))
    joined = a.df.join(F.broadcast(bdf), on=common, how="inner")
    combined = _combine_expr(f, F.col(aval), F.col("__bv"))
    out = joined.withColumn(aval, combined).drop("__bv")
    return NDSparse(out, a.pkey)
