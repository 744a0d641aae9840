"""Selector DSL + selection operators vs inline goldens and duckdb oracle.

Mirrors reference tests test/test_table.jl:181-235 (selectors, transform,
filter forms, dropmissing) re-expressed over the driver testdata.
"""

import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

import juliadb_jl_spark as jdb
from juliadb_jl_spark.plans import selectors as S
from tests.conftest import check_vs_oracle


def test_select_by_name_and_position(tables, duck):
    li = tables["lineitem"]
    out = jdb.select(li, ("l_orderkey", 4))  # 4 = l_linenumber, 1-based
    assert out.columns == ["l_orderkey", "l_linenumber"]
    check_vs_oracle(out.df, duck, "SELECT l_orderkey, l_linenumber FROM lineitem")


def test_select_regex_type_not_between(tables):
    li = tables["lineitem"]
    assert jdb.select(li, re.compile(r"^l_ret")).columns == ["l_returnflag"]
    assert set(jdb.select(li, float).columns) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax"}
    not_cols = jdb.select(li, S.Not("l_orderkey")).columns
    assert "l_orderkey" not in not_cols and len(not_cols) == 10
    between = jdb.select(li, S.Between("l_quantity", "l_tax")).columns
    assert between == ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    fn_sel = jdb.select(li, lambda n: n.endswith("key")).columns
    assert fn_sel == ["l_orderkey", "l_partkey", "l_suppkey"]


def test_select_pair_native_and_udf(tables, duck):
    li = tables["lineitem"]
    # native: fn is a Column->Column lambda
    out = jdb.select(li, ("l_orderkey",
                          S.pair("l_extendedprice", lambda c: c * 2, name="dbl")))
    check_vs_oracle(out.df, duck,
                    "SELECT l_orderkey, l_extendedprice*2 AS dbl FROM lineitem")
    # python closure fallback (pandas_udf)
    out2 = jdb.select(li, S.pair("l_quantity", lambda v: float(v) + 1.0, name="q1",
                                 rtype="double"))
    check_vs_oracle(out2.df, duck, "SELECT l_quantity + 1.0 AS q1 FROM lineitem")


def test_filter_forms(tables, duck):
    li = tables["lineitem"]
    out = jdb.filter_(li, F.col("l_quantity") > 45)
    check_vs_oracle(out.df, duck, "SELECT * FROM lineitem WHERE l_quantity > 45")
    # col=>pred conjunction form (reference test/test_table.jl:227-235)
    out2 = jdb.filter_(li, l_returnflag="R", l_quantity=lambda c: c > 45)
    check_vs_oracle(out2.df, duck,
                    "SELECT * FROM lineitem WHERE l_returnflag='R' AND l_quantity > 45")
    # string expr
    out3 = jdb.filter_(li, "l_discount >= 0.05 AND l_tax < 0.03")
    check_vs_oracle(out3.df, duck,
                    "SELECT * FROM lineitem WHERE l_discount >= 0.05 AND l_tax < 0.03")


def test_transform_rename_insert(tables):
    li = tables["lineitem"]
    t2 = jdb.transform(li, revenue=F.col("l_extendedprice") * (1 - F.col("l_discount")))
    assert "revenue" in t2.columns
    t3 = jdb.rename(t2, revenue="rev")
    assert "rev" in t3.columns and "revenue" not in t3.columns
    t4 = jdb.insertcols(li, 2, "flag", F.lit(1))
    assert t4.columns[1] == "flag"
    t5 = jdb.insertcolsafter(li, "l_orderkey", "after", F.lit(1))
    assert t5.columns[1] == "after"


def test_map_native_and_namedtuple(tables, duck):
    li = tables["lineitem"]
    out = jdb.map_(lambda p, d: p * (1 - d), li,
                   select=("l_extendedprice", "l_discount"), name="rev")
    check_vs_oracle(out.df, duck,
                    "SELECT l_extendedprice*(1-l_discount) AS rev FROM lineitem")
    # named-tuple result (reference test/test_table.jl:31)
    out2 = jdb.map_(lambda q, p: {"r": F.hypot(q, p), "theta": F.atan2(p, q)},
                    li, select=("l_quantity", "l_extendedprice"))
    assert out2.columns == ["r", "theta"]


def test_dropmissing(spark):
    pdf = pd.DataFrame({"a": [1, 2, None, 4], "b": [None, "x", "y", "z"]})
    t = jdb.table(pdf, spark=spark)
    assert jdb.dropmissing(t).count() == 2
    assert jdb.dropmissing(t, "a").count() == 3


def test_table_positional_and_equality(spark):
    t = jdb.table({"x": [3, 1, 2], "y": ["c", "a", "b"]}, pkey="x", spark=spark)
    assert t[1] == {"x": 1, "y": "a"}
    assert t[-1] == {"x": 3, "y": "c"}
    t2 = jdb.table({"x": [1, 2, 3], "y": ["a", "b", "c"]}, pkey="x", spark=spark)
    assert t.same_rows(t2)


def test_ndsparse_lookup(spark):
    nd = jdb.ndsparse({"i": [1, 1, 2], "j": ["a", "b", "a"], "v": [10, 20, 30]},
                      indexcols=("i", "j"), spark=spark)
    assert nd[1, "b"] == 20
    with pytest.raises(KeyError):
        nd[9, "z"]
    sliced = nd[1, slice(None)]
    assert sliced.count() == 2
    nd2 = nd.set_value((1, "b"), v=99)
    assert nd2[1, "b"] == 99
    assert nd.count() == nd2.count()


def test_ndsparse_dup_agg(spark):
    nd = jdb.ndsparse({"i": [1, 1, 2], "v": [10, 20, 30]}, indexcols="i",
                      agg="sum", spark=spark)
    assert nd[1] == 30


def test_selectkeys_selectvalues_convertdim(spark):
    nd = jdb.ndsparse({"i": [1, 1, 2], "j": [1, 2, 1], "v": [10., 20., 30.]},
                      indexcols=("i", "j"), spark=spark)
    sk = jdb.selectkeys(nd, "i", agg="sum")
    assert sk[1] == 30.0
    sv = jdb.selectvalues(nd, "v")
    assert sv.columns == ["i", "j", "v"]
    cd = jdb.convertdim(nd, "j", {1: 10, 2: 20}, agg="sum")
    assert cd[1, 10] == 10.0


def test_buggy_column_lambda_raises(tables):
    # a Column-algebra lambda that references a nonexistent column must
    # raise at analysis, NOT silently degrade to a DoubleType pandas_udf
    # (the probe catches only TypeError/AttributeError/ValueError)
    import pytest
    from pyspark.errors import AnalysisException
    from juliadb_jl_spark.plans import selectors as S
    li = tables["lineitem"]
    with pytest.raises(AnalysisException):
        jdb.select(li, S.pair("l_quantity",
                              lambda c: c + F.col("no_such_column"))).df.collect()


def test_python_closure_still_falls_back(tables):
    # genuine Python closures (and/or chains trip Column.__bool__) keep
    # working through the pandas_udf fallback
    li = tables["lineitem"]
    out = jdb.select(li, S.pair("l_quantity",
                                lambda v: 1.0 if (v > 10 and v < 20) else 0.0,
                                name="mid"))
    got = out.collect()
    assert set(got["mid"]) <= {0.0, 1.0}
