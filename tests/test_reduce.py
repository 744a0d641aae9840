"""Reduction operators vs duckdb oracle + inline goldens.

Mirrors reference tests test/test_table.jl:141-167 (reduce/groupreduce
forms), :237-243 (summarize), test/test_query.jl:61-76 (reducedim).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

import juliadb_jl_spark as jdb
from juliadb_jl_spark.functions import stats as ST
from juliadb_jl_spark.plans import selectors as S
from tests.conftest import check_vs_oracle


def test_reduce_forms(tables):
    li = tables["lineitem"]
    r = jdb.reduce_("sum", li, select="l_quantity")
    assert r["sum"] > 0
    r2 = jdb.reduce_(("sum", "mean", "max"), li, select="l_quantity")
    assert set(r2) == {"sum", "mean", "max"}
    r3 = jdb.reduce_({"total": "sum", "hi": "max"}, li, select="l_quantity")
    assert set(r3) == {"total", "hi"}
    # col=>fn pairs over different columns
    r4 = jdb.reduce_((S.pair("l_quantity", "sum", name="q"),
                      S.pair("l_discount", "mean", name="d")), li)
    assert set(r4) == {"q", "d"}


def test_reduce_python_closure_treereduce(tables):
    li = tables["lineitem"]
    r = jdb.reduce_(lambda a, b: a + b, li, select="l_quantity")
    native = jdb.reduce_("sum", li, select="l_quantity")
    assert abs(r["l_quantity"] - native["sum"]) < 1e-6


def test_groupreduce_vs_oracle(tables, duck):
    li = tables["lineitem"]
    out = jdb.groupreduce(
        {"sum_qty": S.pair("l_quantity", "sum"),
         "avg_price": S.pair("l_extendedprice", "mean"),
         "n": S.pair("l_orderkey", "count")},
        li, by=("l_returnflag", "l_linestatus"))
    check_vs_oracle(out.df, duck, """
        SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
               avg(l_extendedprice) AS avg_price, count(l_orderkey) AS n
        FROM lineitem GROUP BY 1, 2""")


def test_groupreduce_stat_objects(tables, duck):
    li = tables["lineitem"]
    out = jdb.groupreduce({"v": ST.Variance(), "lo_hi": ST.Extrema()},
                          li, by="l_returnflag", select="l_quantity")
    check_vs_oracle(out.df, duck, """
        SELECT l_returnflag, var_samp(l_quantity) AS v,
               min(l_quantity) AS lo_hi_min, max(l_quantity) AS lo_hi_max
        FROM lineitem GROUP BY 1""")


def test_groupreduce_countmap(spark):
    t = jdb.table({"g": ["a", "a", "b"], "v": [1, 1, 2]}, spark=spark)
    out = jdb.groupreduce(ST.CountMap(), t, by="g", select="v").collect()
    m = dict(zip(out["g"], out["countmap"]))
    assert m["a"] == {1: 2} and m["b"] == {2: 1}


def test_groupby_native_median(tables, duck):
    li = tables["lineitem"]
    out = jdb.groupby("median", li, by="l_returnflag", select="l_quantity")
    check_vs_oracle(out.df, duck, """
        SELECT l_returnflag, median(l_quantity) AS median
        FROM lineitem GROUP BY 1""")


def test_groupby_holistic_closure(spark):
    # closure over pandas Series; golden from reference-style semantics
    t = jdb.table({"g": ["x", "x", "y"], "v": [1.0, 3.0, 10.0]}, spark=spark)
    out = jdb.groupby(lambda s: s.max() - s.min(), t, by="g", select="v").collect()
    got = dict(zip(out["g"], out["value"]))
    assert got == {"x": 2.0, "y": 0.0}


def test_groupby_holistic_table_valued_flatten(spark):
    # closure returning a DataFrame per group (reference flatten=true,
    # docs/src/tutorial.md:544-551: rank within group)
    t = jdb.table({"g": ["x", "x", "y"], "v": [3.0, 1.0, 10.0]}, spark=spark)

    def ranked(pdf):
        out = pdf.sort_values("v").reset_index(drop=True)
        out["rank"] = range(1, len(out) + 1)
        return out

    out = jdb.groupby(ranked, t, by="g", select=("v",)).collect()
    assert len(out) == 3
    assert set(zip(out["g"], out["v"], out["rank"])) == {
        ("x", 1.0, 1), ("x", 3.0, 2), ("y", 10.0, 1)}


def test_groupby_usekey(spark):
    t = jdb.table({"g": [1, 1, 2], "v": [1.0, 2.0, 3.0]}, spark=spark)
    out = jdb.groupby(lambda k, s: float(k) * s.sum(), t, by="g", select="v",
                      usekey=True).collect()
    got = dict(zip(out["g"], out["value"]))
    assert got == {1: 3.0, 2: 6.0}


def test_summarize(tables, duck):
    li = tables["lineitem"]
    out = jdb.summarize(("mean", "max"), li, by="l_returnflag",
                        select=("l_quantity", "l_discount"))
    check_vs_oracle(out.df, duck, """
        SELECT l_returnflag,
               avg(l_quantity) AS l_quantity_mean, max(l_quantity) AS l_quantity_max,
               avg(l_discount) AS l_discount_mean, max(l_discount) AS l_discount_max
        FROM lineitem GROUP BY 1""")


def test_reducedim(spark):
    nd = jdb.ndsparse({"i": [1, 1, 2, 2], "j": [1, 2, 1, 2],
                       "v": [1., 2., 3., 4.]}, indexcols=("i", "j"), spark=spark)
    red = jdb.reducedim("sum", nd, dims="j")
    assert red[1] == 3.0 and red[2] == 7.0
    rv = jdb.reducedim_vec(lambda s: float(s.median()), nd, dims="j")
    got = rv.collect()
    assert dict(zip(got["i"], got["value"])) == {1: 1.5, 2: 3.5}


def test_hist_quantile(tables, duck):
    li = tables["lineitem"]
    out = jdb.groupreduce({"q90": ST.Quantile(0.9)}, li,
                          by="l_linestatus", select="l_quantity")
    check_vs_oracle(out.df, duck, """
        SELECT l_linestatus, quantile_cont(l_quantity, 0.9) AS q90
        FROM lineitem GROUP BY 1""")
    h = jdb.groupreduce({"hist": ST.Hist([0, 10, 20, 30, 40, 60])}, li,
                        by="l_returnflag", select="l_quantity").collect()
    assert all(sum(row) > 0 for row in h["hist"])
