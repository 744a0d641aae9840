"""juliadb_jl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of JuliaData/JuliaDB.jl.

Architecture: a thin, well-typed layer over PySpark DataFrames that implements
JuliaDB's API surface (pkey-sorted tables, selector DSL, reducer forms,
key-based joins incl. asof, reshape, grouped holistic ops) by compiling
everything possible to native Column expressions so Catalyst/Tungsten/AQE do
the physical planning.  See SURVEY.md for the operator-by-operator mapping.

Reference semantics: JuliaData/JuliaDB.jl (src/table.jl, src/ndsparse.jl,
src/join.jl, src/reduce.jl, src/selection.jl, src/reshape.jl, src/sort.jl).
This is a re-expression on Spark, not a translation.
"""

from juliadb_jl_spark.session import get_spark
from juliadb_jl_spark.plans.table import Table, NDSparse, table, ndsparse
from juliadb_jl_spark.plans.selectors import (
    Not, Between, Keys, Vals, All, pair, resolve
)
from juliadb_jl_spark.operators.selection import (
    select, filter_, map_, transform, rename, insertcols, insertcolsafter,
    insertcolsbefore, dropmissing, selectkeys, selectvalues, convertdim,
    convertmissing, mapchunks,
)
from juliadb_jl_spark.operators.reduce import (
    reduce_, groupreduce, groupby, summarize, reducedim, reducedim_vec,
    aggregate_stats,
)
from juliadb_jl_spark.operators.join import (
    join, groupjoin, asofjoin, asofjoin_cosourced, naturaljoin, leftjoin,
    merge, broadcast_nd,
    innerjoin, salted_join, range_join, bloom_semi_join, bloom_bitmap,
)
from juliadb_jl_spark.plans.diagnostics import (
    tracktime, timings, reset_timings, start_tracking_time,
    stop_tracking_time, fetch_timings,
)
from juliadb_jl_spark.operators.sort import (
    sort, reindex, rechunk, subtable, permutedims_nd, partition_iter,
)
from juliadb_jl_spark.operators.reshape import stack, unstack, flatten, mapslices
from juliadb_jl_spark.operators import window
from juliadb_jl_spark.operators.setops import union_, intersect_, except_, distinct_
from juliadb_jl_spark.sources.csv import (
    loadtable, loadndsparse, ingest, ingest_, loadfiles, csvread,
)
from juliadb_jl_spark.sources.parquet import save, load
from juliadb_jl_spark.sources.jdbc import load_jdbc, save_jdbc
from juliadb_jl_spark.sources.json import (
    loadjsonl, save_jsonl, parse_json_column, flatten_structs,
)
from juliadb_jl_spark.functions import stats
from juliadb_jl_spark.functions.stats import partitionplot
# LLM-training-pipeline layers (SURVEY.md §2.12): one namespace each
from juliadb_jl_spark.functions import (
    bpe, classifier, clustering, curation, dedup, dsir, incremental,
    multimodal, rollup, sampling, search, similarity, text,
)
from juliadb_jl_spark.functions.dedup import clear_dup_stats
from juliadb_jl_spark.functions.scratch import release_scratch
from juliadb_jl_spark import ml as ML
from juliadb_jl_spark.api import (
    ColDict, Columns, chunks, colnames, column, columns, compute,
    distribute, glob, keys_, pairs, rechunk_together, rows, values_,
)
from juliadb_jl_spark.sources.csv import loadtable as load_table
from juliadb_jl_spark.plans.table import NDSparse as _ND

# reference insert_row! — immutable set_value divergence (documented)
insert_row = _ND.set_value

# The reference exports `NA` (TextParse missing sentinel); Spark's single
# null representation makes it plain None here.
NA = None

__all__ = [
    "get_spark", "Table", "NDSparse", "table", "ndsparse",
    "Not", "Between", "Keys", "Vals", "All", "pair", "resolve",
    "select", "filter_", "map_", "transform", "rename", "insertcols",
    "insertcolsafter", "insertcolsbefore", "dropmissing", "selectkeys",
    "selectvalues", "convertdim", "convertmissing", "mapchunks",
    "reduce_", "groupreduce", "groupby", "summarize", "reducedim",
    "reducedim_vec",
    "join", "groupjoin", "asofjoin", "asofjoin_cosourced", "naturaljoin",
    "leftjoin", "merge",
    "broadcast_nd", "innerjoin", "salted_join", "range_join",
    "bloom_semi_join", "bloom_bitmap",
    "tracktime", "timings", "reset_timings",
    "sort", "reindex", "rechunk", "subtable", "permutedims_nd",
    "partition_iter",
    "stack", "unstack", "flatten", "mapslices", "window",
    "union_", "intersect_", "except_", "distinct_",
    "loadtable", "loadndsparse", "save", "load", "stats",
    "ingest", "ingest_", "loadfiles", "csvread", "aggregate_stats",
    "load_jdbc", "save_jdbc",
    "loadjsonl", "save_jsonl", "parse_json_column", "flatten_structs",
    "partitionplot", "NA",
    "ColDict", "Columns", "chunks", "colnames", "column", "columns",
    "compute", "distribute", "glob", "keys_", "pairs", "rechunk_together",
    "rows", "values_", "ML", "load_table", "insert_row",
    "start_tracking_time", "stop_tracking_time", "fetch_timings",
    "clear_dup_stats",
    "release_scratch",
]

__version__ = "0.1.0"
