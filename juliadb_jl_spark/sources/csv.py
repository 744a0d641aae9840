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


def loadtable(files: str | Sequence[str], spark: SparkSession | None = None,
              pkey: Sequence[str] | str = (), delim: str = ",",
              header_exists: bool = True, colnames: Sequence[str] | None = None,
              nastrings: Sequence[str] | None = None, skiplines_begin: int = 0,
              filenamecol: str | None = None, schema: Any = None,
              output: str | None = None, chunks: int | None = None,
              append: bool = False) -> Table:
    """Load CSV file(s)/dir/glob into a Table (reference src/io.jl:33-64).

    Option mapping: delim→sep, nastrings→nullValue, header_exists→header,
    colnames→explicit schema names, filenamecol→input_file_name(),
    output=→ write-through parquet (the reference's out-of-core ingest,
    src/table.jl:128-152), chunks→repartition.
    """
    spark = spark or SparkSession.getActiveSession()
    paths = _expand(files)

    def _read(ps):
        reader = (spark.read.option("sep", delim)
                  .option("header", str(header_exists).lower())
                  .option("inferSchema", "true" if schema is None else "false"))
        if nastrings:
            reader = reader.option("nullValue", nastrings[0])
        if skiplines_begin:
            reader = reader.option("skipRows", skiplines_begin)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.csv(ps)

    groups = _group_by_header(paths, delim, header_exists, schema)
    dfs = [_read(ps) for ps in groups]
    df = dfs[0]
    for other in dfs[1:]:
        # schema union across files: missing columns become null (reference
        # missing-column fill, src/util.jl:169-176, test_readwrite.jl:67-68)
        df = df.unionByName(other, allowMissingColumns=True)
    if colnames:
        df = df.toDF(*colnames)
    if filenamecol:
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


def loadndsparse(files: str | Sequence[str], indexcols: Sequence[str] | str,
                 datacols: Sequence[str] | None = None,
                 spark: SparkSession | None = None, **kw: Any) -> NDSparse:
    """Load CSVs into an NDSparse keyed on indexcols (reference
    src/io.jl:66-83)."""
    t = loadtable(files, spark=spark, **kw)
    if isinstance(indexcols, str):
        indexcols = (indexcols,)
    indexcols = [t.columns[i - 1] if isinstance(i, int) else i for i in indexcols]
    cols = list(indexcols) + (list(datacols) if datacols else
                              [c for c in t.columns if c not in set(indexcols)])
    return NDSparse(t.df.select(*cols), tuple(indexcols))
