"""Parity tests against the reference's own CSV fixtures
(/root/reference/test/sample/*.csv — read-only stock quotes), mirroring
test/test_readwrite.jl: multi-file NDSparse load with indexcols=(date,
ticker), shuffled file order, filename column, and the asof-style lookup
those fixtures exist for (test/test_join.jl asofjoin uses the same shape).
"""

import glob
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

import juliadb_jl_spark as jdb

SAMPLE = "/root/reference/test/sample"

pytestmark = pytest.mark.skipif(not os.path.isdir(SAMPLE),
                                reason="reference fixtures unavailable")


def test_loadndsparse_reference_fixtures(spark):
    files = sorted(glob.glob(f"{SAMPLE}/*.csv"))
    nd = jdb.loadndsparse(files, indexcols=(1, 2), spark=spark)
    assert nd.pkey == ("date", "ticker")
    pdf = nd.collect()
    # 6 year-files; same tickers each year
    years = pd.to_datetime(pdf["date"]).dt.year
    assert sorted(years.unique()) == [2010, 2011, 2012, 2013, 2014, 2015]
    # rows arrive pkey-sorted (date, ticker)
    assert list(pdf["date"]) == sorted(pdf["date"])
    # point lookup (reference getindex semantics)
    d0, t0 = pdf.iloc[0]["date"], pdf.iloc[0]["ticker"]
    vals = nd[d0, t0]
    assert set(vals) == {"open", "high", "low", "close", "volume"}


def test_shuffled_file_order_same_table(spark):
    files = sorted(glob.glob(f"{SAMPLE}/*.csv"))
    a = jdb.loadndsparse(files, indexcols=(1, 2), spark=spark)
    b = jdb.loadndsparse(list(reversed(files)), indexcols=(1, 2), spark=spark)
    assert a.same_rows(b)  # reference test_readwrite: order-insensitive load


def test_filenamecol_on_fixtures(spark):
    t = jdb.loadtable(f"{SAMPLE}/*.csv", spark=spark, filenamecol="src")
    got = t.df.select(F.regexp_extract("src", r"(\d{4})\.csv$", 1).alias("y")) \
        .distinct().toPandas()
    assert sorted(got["y"]) == ["2010", "2011", "2012", "2013", "2014", "2015"]


def test_asof_lookup_on_stock_fixture(spark):
    t = jdb.loadtable(f"{SAMPLE}/*.csv", spark=spark)
    # left: each ticker's 2012+ dates; right: all quotes → last close ≤ date
    quotes = jdb.table(t.df.select("ticker", "date", "close"))
    asks = jdb.table(t.df.filter(F.col("date") >= "2012-01-01")
                     .select("ticker", "date"))
    out = jdb.asofjoin(asks, quotes, by="ticker", on="date").collect()
    # equal dates match (≤ semantics) → every ask has its own close
    merged = out.merge(quotes.collect(), on=["ticker", "date"], how="left",
                       suffixes=("", "_direct"))
    assert (merged["close"] == merged["close_direct"]).all()


def test_empty_input_sweep(spark):
    """Operators behave on empty tables (no crashes, empty results)."""
    empty = jdb.table(spark.createDataFrame([], "k long, v double"), pkey="k")
    assert jdb.select(empty, "v").count() == 0
    assert jdb.filter_(empty, F.col("v") > 0).count() == 0
    assert jdb.groupreduce("sum", empty, by="k", select="v").count() == 0
    assert jdb.sort(empty, by="v").count() == 0
    assert jdb.stack(empty, ("v",)).count() == 0
    assert jdb.join(empty, empty, lkey="k", rkey="k").count() == 0
    assert jdb.asofjoin(empty, empty, by="k", on="v").count() == 0
    from juliadb_jl_spark.operators import window as wop
    assert wop.topk_per_group(empty, by="k", order="v", k=3).count() == 0


def test_iteration_deconstruction_selectors(spark):
    # reference test/test_iteration.jl:1-30: selector-filtered
    # column/columns/keys/values deconstruction
    nd = jdb.ndsparse({"a": [1, 1], "b": [1, 2], "c": [3, 4]},
                      indexcols=("a", "b"), spark=spark)
    assert list(nd.column("a")) == [1, 1]
    assert list(nd.column("c")) == [3, 4]
    assert list(nd.column(3)) == [3, 4]
    cols = nd.columns_dict(("a", "c"))
    assert sorted(cols) == ["a", "c"] and list(cols["c"]) == [3, 4]
    assert list(nd.keys_("a")["a"]) == [1, 1]
    assert list(nd.values_(1)["c"]) == [3, 4]


def test_broadcast_nd_int_dimmap(spark):
    # reference test/test_join.jl:46-58: broadcast with dimmap=(0,1) —
    # B's single dim aligned to A's SECOND dim
    a = jdb.ndsparse({"i": [1, 2, 3, 4], "j": [1, 1, 2, 2],
                      "v": [5, 6, 7, 8]}, indexcols=("i", "j"), spark=spark)
    b = jdb.ndsparse({"k": [0, 1, 2, 4], "w": [0, 10, 100, 10000]},
                     indexcols=("k",), spark=spark)
    out = jdb.broadcast_nd("+", a, b, dimmap=(0, 1)).collect()
    got = {(i, j): v for i, j, v in zip(out["i"], out["j"], out["v"])}
    # j matches b.k: j=1 → +10, j=2 → +100
    assert got == {(1, 1): 15, (2, 1): 16, (3, 2): 107, (4, 2): 108}
