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
         broadcast: str | None = None, combine: Any = None,
         combine_name: str | None = None) -> Table:
    """Equi-join on lkey/rkey (default: pkeys) with optional projections
    (reference src/join.jl:26-118; tests test/test_table.jl:98-116).

    Duplicate keys produce the cartesian of matches, as in the reference
    (test/test_table.jl:110-112) — standard SQL join semantics.
    `broadcast="right"` applies the broadcast hint (reference
    src/join.jl:37-57; the documented big⋈small out-of-core join).
    Overlapping non-key right columns are suffixed `_1`.

    `combine` is the reference's `join(f, l, r)` form (src/join.jl:26,
    115-118): instead of concatenating the value columns (`concat_tup`,
    the default), apply a binary op to the matched (lvalue, rvalue) pair —
    an op string ("+", "min", ...) or a Column-returning callable.  Each
    side must then select exactly one value column.  Unmatched rows under
    how="left"/"outer" keep the present side's value (the op applies only
    where both sides matched).  The result column is named `combine_name`
    (default: the left value column's name).
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

    use_combine = combine is not None and how in ("inner", "left", "outer")
    if use_combine:
        lvals = [c for c in ldf.columns if c not in lk]
        rvals = [c for c in rdf.columns if c not in lk]
        if len(lvals) != 1 or len(rvals) != 1:
            raise ValueError(
                "join(combine=...) needs exactly one value column per side; "
                f"got {lvals} / {rvals} — narrow with lselect/rselect")
        # presence markers distinguish 'unmatched' from 'matched with null'
        ldf = ldf.withColumn("__lp", F.lit(True))
        rdf = rdf.withColumn("__rp", F.lit(True))

    if broadcast == "right":
        rdf = F.broadcast(rdf)
    elif broadcast == "left":
        ldf = F.broadcast(ldf)

    sp_how = _HOW[how]
    out = ldf.join(rdf, on=lk, how=sp_how)
    if use_combine:
        lv, rv = F.col(lvals[0]), F.col(rvals[0])
        expr = _combine_expr(combine, lv, rv)
        if how == "outer":
            expr = (F.when(F.col("__lp").isNull(), rv)
                    .when(F.col("__rp").isNull(), lv)
                    .otherwise(expr))
        elif how == "left":
            expr = F.when(F.col("__rp").isNull(), lv).otherwise(expr)
        name = combine_name or lvals[0]
        out = (out.withColumn(name, expr)
               .select(*lk, name))
    return Table(out, tuple(lk))


def groupjoin(l: Table, r: Table, how: str = "inner", lkey: Any = None,
              rkey: Any = None, lselect: Any = None, rselect: Any = None,
              combine: Any = None) -> Table:
    """Join with matched pairs collected into a per-key `groups` array
    (reference src/join.jl:120-126 → IndexedTables join(group=true); golden
    cases test/test_table.jl:117-122).

    One output row per key; `groups` holds struct(lselect..., rselect...)
    for every matched (left row × right row) pair, sorted for determinism.
    Duplicate keys on either side collapse into one output row (the pairs
    multiply).  how="left" keeps unmatched left keys, how="outer" also
    keeps right-only keys — both with empty `groups` (the round-1
    outer→left collapse silently dropped right-only keys; fixed).
    `combine` is the reference's `groupjoin(f, ...)` (src/join.jl:120-122):
    each group element becomes f(lvalue, rvalue) instead of the concat
    struct (one value column per side required).

    Scale shape: each side is grouped on its key (two partial-agg
    shuffles), then the per-key cartesian is expanded with native
    higher-order array functions — no row-explosion join and no shuffle of
    the expanded pairs.  Hot keys cost O(|l_k|·|r_k|) memory in one row,
    which is what the reference's semantics require.
    """
    if how not in ("inner", "left", "outer"):
        raise ValueError(f"groupjoin supports inner/left/outer, got {how!r}")
    lk, rk = _keys_of(l, lkey), _keys_of(r, rkey)
    lvals = (S.resolve_names(l.df, lselect, l.pkey) if lselect is not None
             else [c for c in l.df.columns if c not in lk])
    rvals = (S.resolve_names(r.df, rselect, r.pkey) if rselect is not None
             else [c for c in r.df.columns if c not in rk])
    ldf = l.df.select(*dict.fromkeys(lk + lvals))
    rdf = r.df.select(*dict.fromkeys(rk + rvals))
    for a, b in zip(lk, rk):
        if a != b:
            rdf = rdf.withColumnRenamed(b, a)
    # disambiguate right value names colliding with left values or keys
    rvals = list(rvals)
    for i, c in enumerate(rvals):
        if c in lvals or c in lk:
            rdf = rdf.withColumnRenamed(c, f"{c}_1")
            rvals[i] = f"{c}_1"
    if not lvals and not rvals:
        raise ValueError("groupjoin needs at least one value column")
    if combine is not None and (len(lvals) != 1 or len(rvals) != 1):
        raise ValueError("groupjoin(combine=...) needs exactly one value "
                         "column per side")

    # Group each side: value structs where selected, bare row count where a
    # side selects no values (the count drives pair multiplicity).
    lagg = (F.array_sort(F.collect_list(F.struct(*lvals))) if lvals
            else F.count(F.lit(1)).cast("int"))
    ragg = (F.array_sort(F.collect_list(F.struct(*rvals))) if rvals
            else F.count(F.lit(1)).cast("int"))
    lgrp = ldf.groupBy(*lk).agg(lagg.alias("__lg"))
    rgrp = rdf.groupBy(*lk).agg(ragg.alias("__rg"))
    sp_how = {"inner": "inner", "left": "left", "outer": "full"}[how]
    j = lgrp.join(rgrp, on=lk, how=sp_how)
    lg = (F.coalesce(F.col("__lg"), F.array().cast(lgrp.schema["__lg"].dataType))
          if lvals else F.coalesce(F.col("__lg"), F.lit(0)))
    rg = (F.coalesce(F.col("__rg"), F.array().cast(rgrp.schema["__rg"].dataType))
          if rvals else F.coalesce(F.col("__rg"), F.lit(0)))
    if lvals and rvals:
        if combine is not None:
            pair_of = lambda lv, rv: _combine_expr(  # noqa: E731
                combine, lv[lvals[0]], rv[rvals[0]])
        else:
            pair_of = lambda lv, rv: F.struct(  # noqa: E731
                *[lv[c].alias(c) for c in lvals],
                *[rv[c].alias(c) for c in rvals])
        groups = F.flatten(F.transform(
            lg, lambda lv: F.transform(rg, lambda rv: pair_of(lv, rv))))
    elif lvals:  # right side contributes only multiplicity
        groups = F.flatten(F.array_repeat(lg, rg))
    else:        # left side contributes only multiplicity
        groups = F.flatten(F.array_repeat(rg, lg))
    out = j.select(*lk, F.array_sort(groups).alias("groups"))
    return Table(out, tuple(lk))


def _asof_window_tail(unioned: DataFrame, by_names: list[str], on: str,
                      out_names: list[str], tolerance: Any) -> Table:
    """Shared as-of core: last-ignorenulls window over the tagged union
    (__side 1 = left, 0 = right; __rs = the right row's struct), then
    keep left rows and extract `out_names` from the matched struct.
    One implementation so asofjoin and asofjoin_cosourced can never
    diverge on tie ordering, tolerance, or the fill semantics."""
    w = (W.partitionBy(*by_names)
         .orderBy(F.col(on).asc(), F.col("__side").asc())
         .rowsBetween(W.unboundedPreceding, 0))
    filled = unioned.withColumn(
        "__rs", F.last("__rs", ignorenulls=True).over(w))
    if tolerance is not None:
        filled = filled.withColumn(
            "__rs", F.when(F.col(on) - F.col("__rs")["__on"] <= tolerance,
                           F.col("__rs")))
    out = filled.filter(F.col("__side") == 1)
    for c in out_names:
        out = out.withColumn(c, F.col("__rs")[c])
    out = out.drop("__side", "__rs")
    return Table(out, tuple(by_names) + (on,)
                 if on not in by_names else tuple(by_names))


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

    # The whole matched right row rides in ONE struct so every value column
    # comes from the same right row and genuinely-NULL right values stay
    # NULL (a per-column fill would inherit older rows' values per column).
    rt = rdf.select(
        *by_names, F.col(on), F.lit(0).alias("__side"),
        F.struct(F.col(on).alias("__on"),
                 *[F.col(c) for c in rnames]).alias("__rs"))
    for c in l.df.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(l.df.schema[c].dataType))
    lt = (l.df.withColumn("__side", F.lit(1))
          .withColumn("__rs", F.lit(None).cast(rt.schema["__rs"].dataType)))
    unioned = lt.unionByName(rt.select(*lt.columns))
    return _asof_window_tail(unioned, by_names, on, rnames, tolerance)


def asofjoin_cosourced(src: Table, by: Any, on: str,
                       lpred: Column, rpred: Column,
                       lselect: Sequence, rselect: Sequence,
                       tolerance: Any = None,
                       suffix: str = "_asof") -> Table:
    """`asofjoin` whose two sides are DISJOINT FILTERS of one source
    table — the event-log case (clicks as-of-joined to purchases of the
    same events table).  Result-identical to

        asofjoin(table(src.df.filter(lpred).select(by + [on] + lsel)),
                 table(src.df.filter(rpred).select(by + [on] + rsel)),
                 by, on, tolerance=tolerance, suffix=suffix)

    but built from ONE scan: the tagged union feeding the as-of window
    is a single conditional projection of src.filter(lpred | rpred),
    so the source is scanned and decoded once instead of twice —
    Catalyst cannot merge the two Filter(Scan) subtrees of the generic
    form (measured 1.5× on q11 at sf0.1, where each side was a full
    parquet scan).  `lselect`/`rselect` list each side's VALUE columns
    (beyond `by`/`on`) as names or (src_name, out_name) renames.

    Precondition: `lpred` and `rpred` must be disjoint (no row
    satisfies both).  With two separate filters such a row would enter
    BOTH sides; here it would enter only the left side and match
    itself — use the generic `asofjoin` for overlapping predicates.
    NULL-predicate rows drop from both sides in both forms."""
    by_names = _keys_of(src, by)
    lv = [(c, c) if isinstance(c, str) else tuple(c) for c in lselect]
    rv = [(c, c) if isinstance(c, str) else tuple(c) for c in rselect]
    left_cols = set(by_names) | {on} | {o for _, o in lv}
    rnames = [(c, f"{o}{suffix}" if o in left_cols else o) for c, o in rv]
    # same single-struct fill as asofjoin: every right value column
    # comes from ONE matched right row, genuinely-NULL values stay NULL
    rs = F.struct(F.col(on).alias("__on"),
                  *[F.col(c).alias(t) for c, t in rnames])
    u = (src.df.filter(lpred | rpred)
         .select(*by_names, F.col(on),
                 *[F.when(lpred, F.col(c)).alias(o) for c, o in lv],
                 F.when(lpred, F.lit(1)).otherwise(F.lit(0))
                 .alias("__side"),
                 F.when(rpred, rs).alias("__rs")))
    return _asof_window_tail(u, by_names, on,
                             [t for _, t in rnames], tolerance)


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
    Same result set as a plain equi-join for the supported `how`s;
    right-preserving joins (outer/right) would emit every unmatched right
    row once per salt bucket, so they are rejected."""
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(
            f"salted_join supports inner/left/semi/anti, got {how!r}: the "
            "right side is replicated per salt bucket, so right-preserving "
            "joins would duplicate unmatched right rows")
    if isinstance(on, str):
        on = [on]
    ldf = l.df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    rdf = r.df.withColumn("__salt", F.explode(F.array(
        *[F.lit(i) for i in range(salt)])))
    out = ldf.join(rdf, [*on, "__salt"], _HOW[how]).drop("__salt")
    return Table(out, tuple(on))


def bloom_bitmap(df, key_col: str, num_bits: int = 1 << 23,
                 num_hashes: int = 5) -> list[int]:
    """Distributed Bloom-filter build over `df[key_col]`: k xxhash64
    positions per key, OR-aggregated per 64-bit word (`bit_or` — one
    shuffle over at most num_bits/64 rows), collected as a word array
    (1 MiB at the default 8.4M bits — driver-safe at any key count)."""
    m = int(num_bits)
    pos = F.explode(F.array(*[
        F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m))
        for i in range(num_hashes)])).alias("p")
    words = (df.select(pos)
             .select((F.col("p") / 64).cast("int").alias("w"),
                     F.expr("shiftleft(1L, CAST(p % 64 AS INT))").alias("b"))
             .groupBy("w").agg(F.bit_or("b").alias("bits"))
             .collect())
    arr = [0] * (m // 64)
    for row in words:
        arr[row["w"]] = row["bits"]
    return arr


def _bloom_cond(key_col: str, arr_col: str, num_bits: int,
                num_hashes: int) -> Column:
    m = int(num_bits)
    tests = []
    for i in range(num_hashes):
        p = f"pmod(xxhash64(`{key_col}`, {i}), {m}L)"
        tests.append(
            f"(element_at(`{arr_col}`, CAST({p} / 64 AS INT) + 1) & "
            f"shiftleft(1L, CAST({p} % 64 AS INT))) != 0")
    return F.expr(" AND ".join(tests))


def bloom_semi_join(big: Table, small: Table, on: str,
                    num_bits: int = 1 << 23, num_hashes: int = 5,
                    exact: bool = True) -> Table:
    """Semi join with a Bloom pre-filter on the probe side.

    At 100 TB a semi join against a filter set too big to broadcast
    sort-merge-shuffles the ENTIRE probe side; here non-matching probe
    rows are dropped at scan speed first — the key set is compressed into
    a ~1 MiB bitmap (whatever its cardinality) broadcast as a one-row
    array, so only the Bloom survivors reach the exact `left_semi` join
    that removes false positives (`exact=False` skips it: pure
    pre-filter, ~`(1-e^(-kn/m))^k` FP rate).  This is the explicit form
    of Spark's runtime bloom-filter rewrite
    (spark.sql.optimizer.runtime.bloomFilter.enabled), usable when stats
    or join shape keep the automatic rule from firing."""
    arr = bloom_bitmap(small.df, on, num_bits, num_hashes)
    spark = big.df.sparkSession
    bf = spark.createDataFrame([(arr,)], "__bf array<bigint>")
    pruned = (big.df.join(F.broadcast(bf))
              .filter(_bloom_cond(on, "__bf", num_bits, num_hashes))
              .drop("__bf"))
    if exact:
        pruned = pruned.join(small.df.select(on).distinct(), on, "left_semi")
    return Table(pruned, big.pkey)


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
    elif all(isinstance(d, int) for d in dimmap):
        # reference-style int dimmap (test/test_join.jl:56: dimmap=(0,1)):
        # dimmap[i] = j maps A's i-th dim to B's j-th dim, 0 = unmatched
        common = [a.pkey[i] for i, j in enumerate(dimmap) if j]
        bsel = [b.pkey[j - 1] for j in dimmap if j]
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
