"""Free-function export parity (api.py): every name in the reference's
export list (src/JuliaDB.jl:27-37) resolves on the package, and the
ColDict / rechunk_together / deconstruction veneers behave like their
reference counterparts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import juliadb_jl_spark as jdb

REFERENCE_EXPORTS = [
    # Julia-only macros/types that cannot exist in Python are mapped:
    # @cols → Column exprs, @dateformat_str → dateformat= option,
    # DColumns/IndexedTable → Table, NA → None. Everything else is here.
    "All", "Between", "ColDict", "Columns", "Keys", "ML", "NA", "NDSparse",
    "Not", "aggregate_stats", "asofjoin", "chunks", "colnames", "column",
    "columns", "compute", "convertdim", "csvread", "distribute",
    "dropmissing", "fetch_timings", "flatten", "glob", "groupby",
    "groupjoin", "groupreduce", "ingest", "ingest_", "innerjoin",
    "insert_row", "insertcols", "insertcolsafter", "insertcolsbefore",
    "leftjoin", "load", "load_table", "loadfiles", "loadndsparse",
    "loadtable", "merge", "naturaljoin", "ndsparse", "pairs",
    "partitionplot", "rechunk", "rechunk_together", "reducedim_vec",
    "reindex", "rename", "rows", "save", "select", "selectkeys",
    "selectvalues", "stack", "start_tracking_time", "stop_tracking_time",
    "summarize", "table", "tracktime", "transform", "unstack",
    "convertmissing",
]


def test_every_reference_export_resolves():
    missing = [n for n in REFERENCE_EXPORTS if not hasattr(jdb, n)]
    assert not missing, missing


@pytest.fixture(scope="module")
def t(spark):
    return jdb.table(spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")], ["k", "v", "s"]),
        pkey=("k",))


def test_deconstruction_free_functions(t):
    assert jdb.colnames(t) == ["k", "v", "s"]
    assert jdb.column(t, "v").tolist() == [10, 20, 30]
    cols = jdb.columns(t)
    assert set(cols) == {"k", "v", "s"}
    assert [r["v"] for r in jdb.rows(t, ("k", "v"))] == [10, 20, 30]


def test_compute_distribute_chunks(t):
    d = jdb.distribute(t, 2)
    assert jdb.chunks(d) == 2
    c = jdb.compute(d)
    assert c.count() == 3


def test_rechunk_together_copartitions(t, spark):
    r = jdb.table(spark.createDataFrame(
        [(1, "x"), (2, "y")], ["k", "tag"]), pkey=("k",))
    lt, rt = jdb.rechunk_together(t, r, by="k", chunks=4)
    assert jdb.chunks(lt) == jdb.chunks(rt) == 4
    out = jdb.join(lt, rt, how="inner", lkey="k", rkey="k")
    assert out.count() == 2


def test_coldict_edit_cycle(t):
    d = jdb.ColDict(t)
    d["v2"] = F.col("v") * 2                 # Column expr
    d["flag"] = True                          # scalar broadcast
    d["pos"] = [7, 8, 9]                      # positional vector (pkey order)
    d.insertafter("k", "kk", F.col("k") + 100)
    d.rename("s", "label")
    del d["flag"]
    out = d.done().collect()
    assert list(out.columns) == ["k", "kk", "v", "label", "v2", "pos"]
    assert out["kk"].tolist() == [101, 102, 103]
    assert out["v2"].tolist() == [20, 40, 60]
    assert out["pos"].tolist() == [7, 8, 9]


def test_coldict_vector_length_mismatch(t):
    d = jdb.ColDict(t)
    with pytest.raises(ValueError, match="3 rows"):
        d["bad"] = [1, 2]


def test_coldict_insertbefore_and_pkey_guard(t):
    d = jdb.ColDict(t)
    d.insertbefore("v", "z", 0)
    assert list(d.done().df.columns) == ["k", "z", "v", "s"]
    with pytest.raises(ValueError, match="pkey"):
        del d["k"]


def test_columns_shim_and_table_roundtrip(spark):
    data = jdb.Columns(a=[1, 2], b=["x", "y"])
    assert data == {"a": [1, 2], "b": ["x", "y"]}
    t = jdb.table(data, pkey="a", spark=spark)
    assert t.collect()["b"].tolist() == ["x", "y"]


def test_imperative_time_tracking(t):
    jdb.reset_timings()
    jdb.start_tracking_time("block", t.df.sparkSession)
    t.count()
    jdb.stop_tracking_time()
    tm = jdb.fetch_timings()
    assert list(tm["label"]) == ["block"]
    assert (tm["seconds"] >= 0).all()


def test_insert_row_alias(spark):
    nd = jdb.ndsparse(spark.createDataFrame(
        [(1, 2, 4), (2, 3, 5)], ["x", "y", "v"]), indexcols=("x", "y"))
    out = jdb.insert_row(nd, (2, 4), v=7)
    got = out.collect()
    assert len(got) == 3 and got["v"].tolist()[-1] == 7