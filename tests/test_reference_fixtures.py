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


def test_query_jl_map_filter_dims_parity(spark):
    # reference test/test_query.jl: NDSparse map keeps the index (:1-6),
    # positional-pair filter (:24-38), int dims in convertdim (:45-59)
    # and reduce dims (:63-78)
    nd = jdb.ndsparse({"a": [1, 1, 2, 2], "b": [1, 2, 1, 2],
                       "v": [1, 2, 3, 4]}, indexcols=("a", "b"), spark=spark)
    # map(-, d): index kept, values negated
    neg = jdb.map_(lambda c: -c, nd).collect()
    assert list(neg.columns) == ["a", "b", "v"]
    assert sorted(neg["v"]) == [-4, -3, -2, -1]
    # filter with positional 1-based keys
    f = jdb.filter_(nd, {1: lambda c: c == c, 2: lambda c: c % 2 == 0})
    assert sorted(f.collect()["v"]) == [2, 4]
    # empty result (reference #228 regression)
    f0 = jdb.filter_(nd, {1: lambda c: c != c, 2: lambda c: c % 2 == 0})
    assert len(f0.collect()) == 0
    # reduce(+, t1, dims=1) — reduce out the FIRST dim
    rd = jdb.reducedim("sum", nd, dims=1).collect()
    assert {b: s for b, s in zip(rd["b"], rd["sum"])} == {1: 4, 2: 6}
    # reducedim_vec(length, t1, 2)
    rv = jdb.reducedim_vec(len, nd, 2).collect()
    assert {a: n for a, n in zip(rv["a"], rv["value"])} == {1: 2, 2: 2}
    # convertdim by position with predicate mapping
    cd = jdb.convertdim(nd, 2, lambda c: (c >= 2).cast("int"), agg="sum")
    got = cd.collect()
    assert {(a, b): v for a, b, v in zip(got["a"], got["b"], got["v"])} == {
        (1, 0): 1, (1, 1): 2, (2, 0): 3, (2, 1): 4}


def test_row_closure_filter_and_map(spark):
    # reference test/test_table.jl:200-203, 227-231: whole-row closures
    t = jdb.table({"n": ["a", "b", "c"], "t": [0.01, 0.05, 0.07],
                   "x": [2, 1, 0]}, spark=spark)
    f = jdb.filter_(t, lambda p: p.x / p.t < 100)
    assert sorted(f.collect()["n"]) == ["b", "c"]
    # row closure over an explicit sub-selection
    f2 = jdb.filter_(t, lambda p: p.x / p.t < 100, select=("x", "t"))
    assert sorted(f2.collect()["n"]) == ["b", "c"]
    # NDSparse bare closure filters the VALUES
    nd = jdb.ndsparse({"n": ["a", "b", "c"], "t": [0.01, 0.05, 0.07],
                       "v": [2, 1, 0]}, indexcols=("n", "t"), spark=spark)
    fn = jdb.filter_(nd, lambda y: y < 2)
    assert sorted(fn.collect()["n"]) == ["b", "c"]
    # whole-row map: manhattan + named-tuple (struct rtype) polar form
    manh = jdb.map_(lambda row: float(row.x + row.t), t, select=("t", "x"))
    assert sorted(round(v, 2) for v in manh.collect()["map"]) == \
        [0.07, 1.05, 2.01]
    import math
    polar = jdb.map_(lambda p: {"r": math.hypot(p.x + p.t, 0.0),
                                "theta": math.atan2(p.t, p.x)},
                     t, select=("t", "x"),
                     rtype="r double, theta double")
    got = polar.collect()
    assert set(got.columns) == {"r", "theta"}
    assert len(got) == 3


def test_empty_input_sweep_pipeline_ops(spark):
    """New pipeline operators behave on empty tables."""
    from juliadb_jl_spark.functions import curation as CU
    from juliadb_jl_spark.functions import dedup as DD
    from juliadb_jl_spark.functions import text as TX
    edocs = spark.createDataFrame([], "doc_id long, text string")
    assert CU.c4_line_clean(edocs).count() == 0
    assert CU.repetition_stats(edocs).count() == 0
    assert TX.word_freqs(edocs).count() == 0
    assert TX.bpe_top_pairs(edocs).count() == 0
    evecs = spark.createDataFrame([], "vec_id long, emb array<double>")
    assert DD.embedding_pairs_exact(evecs, "vec_id", "emb").count() == 0
    # semantic_dedup on empty pairs: components over no edges -> no drops
    assert DD.dedup_by_clusters(
        evecs, DD.embedding_pairs_exact(evecs, "vec_id", "emb"),
        "vec_id").count() == 0


def test_read_table_timestamp_pushdown(spark):
    """Predicate pushdown must survive the NTZ->LTZ normalization cast
    in read_table (Catalyst unwraps the UTC no-op cast): a ts filter
    reaches the parquet scan as a PushedFilter, and column pruning
    holds. Regression guard for driver-regenerated testdata layouts."""
    from juliadb_jl_spark.sources.testdata import read_table
    df = read_table(spark, "/root/testdata/sf0.001", "events")
    if dict(df.dtypes).get("ts") != "timestamp":
        import pytest
        pytest.skip("testdata layout has no normalized ts column")
    f = df.filter(F.col("ts") > "2024-01-01").select("event_id", "ts")
    plan = f._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert scan and "GreaterThan(ts" in scan[0]
    assert "ReadSchema: struct<event_id:bigint,ts:timestamp" in scan[0]
