"""Join operators vs duckdb oracle + reference inline goldens.

Mirrors reference tests test/test_table.jl:98-140 (join hows, groupjoin,
merge, broadcast) and test/test_join.jl:32-43 (asofjoin).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

import juliadb_jl_spark as jdb
from tests.conftest import check_vs_oracle


@pytest.fixture()
def lr(spark):
    # reference-style small tables with duplicate + unmatched keys
    l = jdb.table({"id": [1, 1, 2, 3], "x": [1, 2, 3, 4]}, pkey="id", spark=spark)
    r = jdb.table({"id": [0, 1, 1, 3], "y": [1, 2, 3, 4]}, pkey="id", spark=spark)
    return l, r


def test_join_hows_golden(lr):
    l, r = lr
    inner = jdb.join(l, r).collect()
    # duplicate keys → cartesian of matches (test/test_table.jl:110-112)
    assert len(inner) == 5
    assert sorted(zip(inner["id"], inner["x"], inner["y"])) == [
        (1, 1, 2), (1, 1, 3), (1, 2, 2), (1, 2, 3), (3, 4, 4)]
    left = jdb.join(l, r, how="left").collect()
    assert len(left) == 6
    assert pd.isna(left[left["id"] == 2]["y"]).all()
    outer = jdb.join(l, r, how="outer").collect()
    assert len(outer) == 7
    anti = jdb.join(l, r, how="anti").collect()
    assert list(anti["id"]) == [2]


def test_join_vs_oracle(tables, duck):
    o, c = tables["orders"], tables["customer"]
    out = jdb.join(o, c, how="inner", lkey="o_custkey", rkey="c_custkey",
                   lselect=("o_orderkey", "o_totalprice"),
                   rselect=("c_name", "c_mktsegment"))
    check_vs_oracle(out.df, duck, """
        SELECT o_custkey, o_orderkey, o_totalprice, c_name, c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey""")


def test_join_broadcast_plan(tables):
    o, n = tables["orders"], tables["nation"]
    out = jdb.join(tables["customer"], n, how="inner",
                   lkey="c_nationkey", rkey="n_nationkey", broadcast="right")
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


@pytest.fixture()
def groupjoin_lr(spark):
    # exact reference fixture (test/test_table.jl:117-122)
    l = jdb.table({"a": [1, 1, 1, 2], "b": [1, 2, 2, 1], "c": [1, 2, 3, 4]},
                  pkey=("a", "b"), spark=spark)
    r = jdb.table({"a": [0, 1, 1, 2], "b": [1, 2, 2, 1], "d": [1, 2, 3, 4]},
                  pkey=("a", "b"), spark=spark)
    return l, r


def _groups_map(g):
    return {tuple(k): sorted((row["c"], row["d"]) for row in grp)
            for *k, grp in zip(g["a"], g["b"], g["groups"])}


def test_groupjoin_golden_inner(groupjoin_lr):
    # reference test/test_table.jl:119: pair-cartesian per key, dup left
    # keys collapse into one row
    l, r = groupjoin_lr
    g = jdb.groupjoin(l, r).collect()
    assert _groups_map(g) == {
        (1, 2): [(2, 2), (2, 3), (3, 2), (3, 3)],
        (2, 1): [(4, 4)],
    }


def test_groupjoin_golden_left(groupjoin_lr):
    # reference test/test_table.jl:120: left-only key (1,1) kept, empty group
    l, r = groupjoin_lr
    g = jdb.groupjoin(l, r, how="left").collect()
    assert _groups_map(g) == {
        (1, 1): [],
        (1, 2): [(2, 2), (2, 3), (3, 2), (3, 3)],
        (2, 1): [(4, 4)],
    }


def test_groupjoin_golden_outer(groupjoin_lr):
    # reference test/test_table.jl:121: right-only key (0,1) ALSO kept
    # (round-1 outer→left collapse dropped it — VERDICT fix #3)
    l, r = groupjoin_lr
    g = jdb.groupjoin(l, r, how="outer").collect()
    assert _groups_map(g) == {
        (0, 1): [],
        (1, 1): [],
        (1, 2): [(2, 2), (2, 3), (3, 2), (3, 3)],
        (2, 1): [(4, 4)],
    }


def test_groupjoin_golden_outer_select(groupjoin_lr):
    # reference test/test_table.jl:122: single-key outer with selects
    l, r = groupjoin_lr
    g = jdb.groupjoin(l, r, how="outer", lkey="a", rkey="a",
                      lselect="c", rselect="d").collect()
    got = {k: sorted((row["c"], row["d"]) for row in grp)
           for k, grp in zip(g["a"], g["groups"])}
    assert got == {
        0: [],
        1: [(1, 2), (1, 3), (2, 2), (2, 3), (3, 2), (3, 3)],
        2: [(4, 4)],
    }


def test_groupjoin_combine(groupjoin_lr):
    # groupjoin(f, ...) form (reference src/join.jl:120-122): group elements
    # become f(lval, rval) scalars
    l, r = groupjoin_lr
    g = jdb.groupjoin(l, r, lkey="a", rkey="a", lselect="c", rselect="d",
                      combine="+").collect()
    got = {k: sorted(grp) for k, grp in zip(g["a"], g["groups"])}
    assert got == {1: [3, 4, 4, 5, 5, 6], 2: [8]}


def test_join_combine_golden(lr):
    # join(f, l, r) (reference src/join.jl:26,115-118): op on matched value
    # pairs instead of concat; left/outer keep present-side values
    l, r = lr
    inner = jdb.join(l, r, combine="+", combine_name="v").collect()
    assert sorted(zip(inner["id"], inner["v"])) == [
        (1, 3), (1, 4), (1, 4), (1, 5), (3, 8)]
    outer = jdb.join(l, r, how="outer", combine="+", combine_name="v").collect()
    got = sorted(zip(outer["id"], outer["v"]))
    assert got == [(0, 1), (1, 3), (1, 4), (1, 4), (1, 5), (2, 3), (3, 8)]
    # callable combine compiles to a native Column expression
    mx = jdb.join(l, r, combine=lambda a, b: F.greatest(a, b),
                  combine_name="m").collect()
    assert sorted(zip(mx["id"], mx["m"]))[-1] == (3, 4)


def test_asofjoin_golden(spark):
    # reference asof semantics (test/test_join.jl:32-43): latest right ≤ left
    l = jdb.table({"t": ["a", "a", "b"], "time": [2, 5, 1], "lv": [10, 20, 30]},
                  spark=spark)
    r = jdb.table({"t": ["a", "a", "b"], "time": [1, 5, 2], "rv": [100, 200, 300]},
                  spark=spark)
    out = jdb.asofjoin(l, r, by="t", on="time").collect()
    got = {(t, tm): rv for t, tm, rv in zip(out["t"], out["time"], out["rv"])}
    assert got[("a", 2)] == 100      # latest ≤ 2 is time=1
    assert got[("a", 5)] == 200      # equal timestamp matches
    assert pd.isna(got[("b", 1)])    # nothing ≤ 1 for b


def test_asofjoin_vs_duckdb_asof(tables, duck):
    ev = tables["events"]
    clicks = jdb.table(ev.df.filter(F.col("event_type") == "click")
                       .select("user_id", "ts", "event_id"))
    buys = jdb.table(ev.df.filter(F.col("event_type") == "purchase")
                     .select("user_id", "ts", F.col("value").alias("pv")))
    out = jdb.asofjoin(clicks, buys, by="user_id", on="ts")
    check_vs_oracle(out.df, duck, """
        WITH a AS (SELECT user_id, ts, event_id FROM events WHERE event_type='click'),
             b AS (SELECT user_id AS uid, ts AS bts, value AS pv
                   FROM events WHERE event_type='purchase')
        SELECT a.user_id, a.ts, a.event_id, b.pv
        FROM a ASOF LEFT JOIN b ON a.user_id = b.uid AND a.ts >= b.bts""")


def test_asofjoin_cosourced_equivalence(tables, spark):
    """asofjoin_cosourced (single-scan form, r10) must be row-identical
    to the generic two-filter asofjoin on the same disjoint-predicate
    split — including NULL right values, equal-timestamp ties, suffix
    collisions, and tolerance."""
    ev = tables["events"]
    lp = F.col("event_type") == "click"
    rp = F.col("event_type") == "purchase"
    clicks = jdb.table(ev.df.filter(lp).select("user_id", "ts", "event_id"))
    buys = jdb.table(ev.df.filter(rp)
                     .select("user_id", "ts", F.col("value").alias("pv")))
    for tol in (None, F.expr("INTERVAL 2 DAYS")):
        ref = (jdb.asofjoin(clicks, buys, by="user_id", on="ts",
                            tolerance=tol).df.toPandas()
               .sort_values(["user_id", "ts", "event_id"],
                            ignore_index=True))
        got = (jdb.asofjoin_cosourced(
                   ev, by="user_id", on="ts", lpred=lp, rpred=rp,
                   lselect=["event_id"], rselect=[("value", "pv")],
                   tolerance=tol).df
               .select(*ref.columns).toPandas()
               .sort_values(["user_id", "ts", "event_id"],
                            ignore_index=True))
        pd.testing.assert_frame_equal(ref, got)
    # suffix collision: right value column named like a left one
    ref = (jdb.asofjoin(
               clicks,
               jdb.table(ev.df.filter(rp).select(
                   "user_id", "ts", F.col("value").alias("event_id"))),
               by="user_id", on="ts").df.toPandas()
           .sort_values(["user_id", "ts", "event_id"], ignore_index=True))
    got = (jdb.asofjoin_cosourced(
               ev, by="user_id", on="ts", lpred=lp, rpred=rp,
               lselect=["event_id"],
               rselect=[("value", "event_id")]).df
           .select(*ref.columns).toPandas()
           .sort_values(["user_id", "ts", "event_id"], ignore_index=True))
    assert "event_id_asof" in ref.columns
    pd.testing.assert_frame_equal(ref, got)


def test_merge_tables(spark):
    a = jdb.table({"x": [1, 3], "y": ["a", "c"]}, pkey="x", spark=spark)
    b = jdb.table({"x": [2, 4], "y": ["b", "d"]}, pkey="x", spark=spark)
    m = jdb.merge(a, b).collect()
    assert list(m["x"]) == [1, 2, 3, 4]  # pkey-ordered union


def test_merge_ndsparse_agg_and_rightwins(spark):
    a = jdb.ndsparse({"k": [1, 2], "v": [10., 20.]}, indexcols="k", spark=spark)
    b = jdb.ndsparse({"k": [2, 3], "v": [5., 30.]}, indexcols="k", spark=spark)
    m = jdb.merge(a, b, agg="sum")
    assert m[2] == 25.0
    rw = jdb.merge(a, b)   # right-wins default (src/join.jl:245-262)
    assert rw[2] == 5.0 and rw[1] == 10.0 and rw[3] == 30.0


def test_naturaljoin_leftjoin_nd(spark):
    a = jdb.ndsparse({"i": [1, 2, 3], "v": [1., 2., 3.]}, indexcols="i", spark=spark)
    b = jdb.ndsparse({"i": [1, 2], "v": [10., 20.]}, indexcols="i", spark=spark)
    nj = jdb.naturaljoin("+", a, b)
    assert nj[1] == 11.0 and nj.count() == 2
    lj = jdb.leftjoin("+", a, b)
    assert lj[3] == 3.0 and lj.count() == 3


def test_broadcast_nd_dimmap(spark):
    # reference test/test_join.jl:46-59: B's dims match a subset of A's
    a = jdb.ndsparse({"i": [1, 1, 2, 2], "j": [1, 2, 1, 2], "v": [1., 2., 3., 4.]},
                     indexcols=("i", "j"), spark=spark)
    b = jdb.ndsparse({"i": [1, 2], "w": [10., 100.]}, indexcols="i", spark=spark)
    out = jdb.broadcast_nd("*", a, b)
    assert out[1, 2] == 20.0 and out[2, 2] == 400.0


def test_setops(lr):
    l, r = lr
    u = jdb.union_(l, jdb.rename(r, y="x"))
    assert u.count() == 8
    i = jdb.intersect_(jdb.select(l, "id"), jdb.select(r, "id"))
    assert sorted(i.collect()["id"]) == [1, 3]
    e = jdb.except_(jdb.select(l, "id"), jdb.select(r, "id"), all=False)
    assert sorted(e.collect()["id"]) == [2]
