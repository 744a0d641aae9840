"""CSV ingest: loadtable / loadndsparse.

Reference: JuliaDB src/io.jl:33-83 (`loadtable`/`loadndsparse` option
surface) and src/util.jl:48-185 (per-chunk parse, filename column,
missing-column fill).  Catalyst's FileSourceScanExec does the reference's
whole ingest plan (file listing, split planning, schema merge, executor-
side parse) — this module only translates options and pkey bookkeeping.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import Any, Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from juliadb_jl_spark.plans.table import NDSparse, Table


def _expand(files: str | Sequence[str]) -> list[str]:
    if isinstance(files, str):
        if os.path.isdir(files):
            return [files]
        hits = _glob.glob(files)
        return hits or [files]
    return list(files)


def _group_by_header(paths: list[str], delim: str, header_exists: bool,
                     schema: Any) -> list[list[str]]:
    """Group files by identical header line so files with different column
    sets can be read per-group and schema-unioned (reference `samecols`
    handling). Directories/globs-with-one-entry skip the peek entirely —
    the common case stays a single multi-file scan."""
    if schema is not None or not header_exists or len(paths) <= 1 \
            or any(os.path.isdir(p) for p in paths):
        return [paths]
    by_header: dict[str, list[str]] = {}
    for p in paths:
        try:
            with open(p, "r", errors="replace") as fh:
                head = fh.readline().strip()
        except OSError:
            head = ""
        by_header.setdefault(head, []).append(p)
    return list(by_header.values())


def _samecols_renames(samecols: Sequence[Sequence[str]] | None) -> dict[str, str]:
    """alias → canonical-name map; the FIRST name in each group is
    canonical (reference src/io.jl:55: 'vendor_id and VendorID')."""
    out: dict[str, str] = {}
    for group in samecols or ():
        canon, *aliases = list(group)
        for a in aliases:
            out[a] = canon
    return out


def loadtable(files: str | Sequence[str], spark: SparkSession | None = None,
              pkey: Sequence[str] | str = (), delim: str = ",",
              header_exists: bool = True, colnames: Sequence[str] | None = None,
              nastrings: Sequence[str] | None = None, skiplines_begin: int = 0,
              filenamecol: str | None = None, schema: Any = None,
              samecols: Sequence[Sequence[str]] | None = None,
              dateformat: str | None = None, timestampformat: str | None = None,
              output: str | None = None, chunks: int | None = None,
              append: bool = False) -> Table:
    """Load CSV file(s)/dir/glob into a Table (reference src/io.jl:33-64).

    Option mapping: delim→sep, nastrings→nullValue (+ post-read null-out of
    the remaining NA strings), header_exists→header, colnames→explicit
    schema names, filenamecol→input_file_name(), samecols→per-file-group
    rename to the group's first (canonical) name before the union,
    skiplines_begin→distributed drop of the first n lines per file (OSS
    Spark's CSV source has no skip-rows option), output=→ write-through
    parquet (the reference's out-of-core ingest, src/table.jl:128-152),
    chunks→repartition.
    """
    spark = spark or SparkSession.getActiveSession()
    paths = _expand(files)

    def _read(ps):
        reader = (spark.read.option("sep", delim)
                  .option("header", str(header_exists).lower())
                  .option("inferSchema", "true" if schema is None else "false"))
        if nastrings:
            reader = reader.option("nullValue", nastrings[0])
        if dateformat:
            # the reference's @dateformat_str / colparsers date formats
            # (src/io.jl:56) → Spark's reader-side format options
            reader = reader.option("dateFormat", dateformat)
        if timestampformat:
            reader = reader.option("timestampFormat", timestampformat)
        if schema is not None:
            reader = reader.schema(schema)
        if not skiplines_begin:
            return reader.csv(ps)
        # No skipRows in OSS Spark's CSVOptions → drop the first n lines of
        # each file distributedly: per-file textFile keeps line order, so a
        # zipWithIndex filter is exact; the CSV parser then runs on the
        # remaining lines (header handling still applies).
        sc = spark.sparkContext
        flat: list[str] = []
        for p in ps:
            flat.extend(sorted(_glob.glob(os.path.join(p, "*")))
                        if os.path.isdir(p) else [p])
        n = int(skiplines_begin)
        rdds = [sc.textFile(p).zipWithIndex()
                .filter(lambda kv, _n=n: kv[1] >= _n).map(lambda kv: kv[0])
                for p in flat]
        rdd = rdds[0] if len(rdds) == 1 else sc.union(rdds)
        return reader.csv(rdd)

    groups = _group_by_header(paths, delim, header_exists, schema)
    renames = _samecols_renames(samecols)
    dfs = []
    for ps in groups:
        d = _read(ps)
        for alias, canon in renames.items():
            if alias in d.columns and canon not in d.columns:
                d = d.withColumnRenamed(alias, canon)
        dfs.append(d)
    df = dfs[0]
    for other in dfs[1:]:
        # schema union across files: missing columns become null (reference
        # missing-column fill, src/util.jl:169-176, test_readwrite.jl:67-68)
        df = df.unionByName(other, allowMissingColumns=True)
    if nastrings and len(nastrings) > 1:
        # Spark's CSV source takes a single nullValue; null out the rest
        # post-read (typed columns already turned unparseable NAs into null)
        rest = list(nastrings[1:])
        for f in df.schema.fields:
            if f.dataType.simpleString() == "string":
                df = df.withColumn(
                    f.name, F.when(F.col(f.name).isin(rest), None)
                    .otherwise(F.col(f.name)))
    if colnames:
        df = df.toDF(*colnames)
    if filenamecol:
        if skiplines_begin:
            raise ValueError("filenamecol is unavailable with "
                             "skiplines_begin: the text-level preamble skip "
                             "loses file provenance")
        df = df.withColumn(filenamecol, F.input_file_name())
    if chunks:
        df = df.repartition(chunks)
    t = Table(df, tuple((pkey,) if isinstance(pkey, str) else pkey))
    if output:
        # out-of-core ingest: stream straight to parquet and reopen
        # (reference output=/append= ingest, src/io.jl:134-142)
        from juliadb_jl_spark.sources.parquet import save, load
        save(t, output, mode="append" if append else "overwrite")
        return load(output, spark)
    return t


def ingest(files: str | Sequence[str], output: str,
           spark: SparkSession | None = None, **kw: Any) -> Table:
    """Out-of-core ingest (reference `ingest`, src/io.jl:87-117): parse
    CSVs and write straight through to the binary store (parquet here),
    reopening the stored table — the input never has to fit in memory."""
    return loadtable(files, spark=spark, output=output, **kw)


def ingest_(files: str | Sequence[str], output: str,
            spark: SparkSession | None = None, **kw: Any) -> Table:
    """Reference `ingest!` (src/io.jl:119-142): append new files into an
    existing ingest output."""
    return loadtable(files, spark=spark, output=output, append=True, **kw)


def loadfiles(files: str | Sequence[str], *a: Any, **kw: Any) -> Table:
    """Deprecated reference alias of loadtable (kept for surface parity)."""
    import warnings
    warnings.warn("loadfiles is deprecated in the reference; use loadtable",
                  DeprecationWarning, stacklevel=2)
    return loadtable(files, *a, **kw)


def csvread(file: str, delim: str = ",",
            spark: SparkSession | None = None, **kw: Any) -> Table:
    """Single-CSV read (the reference re-exports TextParse.csvread); the
    column-vectors return form collapses to a Table here."""
    return loadtable(file, spark=spark, delim=delim, **kw)


def loadndsparse(files: str | Sequence[str],
                 indexcols: Sequence[str] | str | None = None,
                 datacols: Sequence[str] | None = None,
                 spark: SparkSession | None = None, **kw: Any) -> NDSparse:
    """Load CSVs into an NDSparse keyed on indexcols (reference
    src/io.jl:66-83).

    With no `indexcols`, the reference creates an implicit 1:n row index
    (src/io.jl:151-154, src/util.jl:121-123); here that is a `row` dimension
    numbered in load order (contiguous, computed with the two-pass
    per-partition offset scheme — no single-partition stage)."""
    t = loadtable(files, spark=spark, **kw)
    if indexcols is None or (not isinstance(indexcols, (str, int))
                             and len(indexcols) == 0):
        from juliadb_jl_spark.operators.sort import with_global_rownum
        df = with_global_rownum(t.df, "row")
        cols = ["row"] + (list(datacols) if datacols else list(t.columns))
        return NDSparse(df.select(*cols), ("row",), presorted=True)
    if isinstance(indexcols, (str, int)):
        indexcols = (indexcols,)
    indexcols = [t.columns[i - 1] if isinstance(i, int) else i for i in indexcols]
    cols = list(indexcols) + (list(datacols) if datacols else
                              [c for c in t.columns if c not in set(indexcols)])
    return NDSparse(t.df.select(*cols), tuple(indexcols))
