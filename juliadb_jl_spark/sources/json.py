"""JSONL ingest: loadjsonl / save_jsonl / parse_json_column /
flatten_structs.

The reference's ingest surface is CSV-shaped (src/io.jl:33-83), but the
dominant interchange format for web-crawl / training-data pipelines is
line-delimited JSON — this module gives it the same Table-level surface
as `sources/csv.py` (glob/dir expansion, filename provenance column,
out-of-core write-through, pkey bookkeeping) on top of Catalyst's native
JSON source.

Scale (100 TB):
- Schema inference reads the data ONCE before the real scan — at scale
  pass an explicit `schema`, or bound the inference pass with
  `sampling_ratio` (maps to Spark's `samplingRatio`, which subsamples
  the inference scan).
- Parsing is executor-side (`FileSourceScanExec` + Jackson); gzipped
  JSONL (`*.jsonl.gz`) is splittable per FILE not per block, so shard
  crawls into many files upstream.
- `parse_json_column` is a per-row native `from_json` — zero shuffle;
  schema auto-derivation samples ONE non-null value driver-side (pass
  `schema` explicitly when fields vary across rows).
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from juliadb_jl_spark.plans.table import Table
from juliadb_jl_spark.sources.csv import _expand


def loadjsonl(files: str | Sequence[str], spark: SparkSession | None = None,
              pkey: Sequence[str] | str = (), schema: Any = None,
              filenamecol: str | None = None, multiline: bool = False,
              drop_corrupt: bool = False, corrupt_col: str | None = None,
              sampling_ratio: float | None = None,
              timestampformat: str | None = None,
              chunks: int | None = None, output: str | None = None,
              append: bool = False) -> Table:
    """Load line-delimited JSON file(s)/dir/glob into a Table.

    Options: `schema` skips inference (the 100-TB path);
    `sampling_ratio` bounds the inference scan; `drop_corrupt` maps to
    DROPMALFORMED (silently skip bad lines) while `corrupt_col` keeps
    bad lines' raw text in a column (PERMISSIVE audit mode — the
    ingest-QA default for crawls); `multiline` parses whole-file JSON
    arrays/objects instead of JSONL (NOT splittable — one task per
    file); `filenamecol` adds file provenance; `output=`/`append=` is
    the out-of-core write-through ingest; `chunks` repartitions.
    Different files' schemas union natively (missing fields → null).
    """
    spark = spark or SparkSession.getActiveSession()
    if drop_corrupt and corrupt_col:
        raise ValueError("drop_corrupt and corrupt_col are exclusive: "
                         "dropped lines cannot also be kept")
    reader = spark.read
    if corrupt_col:
        # PERMISSIVE + corrupt column requires BOTH the option and (for
        # explicit schemas) the column in the schema — option-only with
        # a schema silently captures nothing, and the backfill below
        # would mask that with an always-NULL column.
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    if schema is not None:
        if corrupt_col:
            from pyspark.sql.types import (StringType, StructField,
                                           StructType)
            st = (schema if isinstance(schema, StructType)
                  else StructType.fromDDL(schema))
            if corrupt_col not in st.fieldNames():
                st = StructType(list(st.fields)
                                + [StructField(corrupt_col, StringType())])
            schema = st
        reader = reader.schema(schema)
    if drop_corrupt:
        reader = reader.option("mode", "DROPMALFORMED")
    elif corrupt_col:
        reader = reader.option("mode", "PERMISSIVE")
    if multiline:
        reader = reader.option("multiLine", "true")
    if sampling_ratio is not None:
        reader = reader.option("samplingRatio", str(float(sampling_ratio)))
    if timestampformat:
        reader = reader.option("timestampFormat", timestampformat)
    df = reader.json(_expand(files))
    if corrupt_col and corrupt_col not in df.columns:
        # no corrupt lines anywhere → Spark omits the column; keep the
        # declared surface stable for downstream audits
        df = df.withColumn(corrupt_col, F.lit(None).cast("string"))
    if filenamecol:
        df = df.withColumn(filenamecol, F.input_file_name())
    if chunks:
        df = df.repartition(chunks)
    t = Table(df, tuple((pkey,) if isinstance(pkey, str) else pkey))
    if output:
        from juliadb_jl_spark.sources.parquet import load, save
        save(t, output, mode="append" if append else "overwrite")
        return load(output, spark)
    return t


def save_jsonl(t: Table | DataFrame, path: str, mode: str = "overwrite",
               compression: str | None = None) -> None:
    """Write a Table/DataFrame as line-delimited JSON (one object per
    line, one file per partition — the interchange shape crawls and
    eval harnesses consume). `compression`: gzip/zstd/none."""
    df = t.df if isinstance(t, Table) else t
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def flatten_structs(df: DataFrame, sep: str = "_",
                    max_depth: int = 8) -> DataFrame:
    """Flatten nested struct columns into top-level columns
    (`meta.url` → `meta_url`) — JSONL crawls nest metadata, and flat
    columns are what joins/aggregations/parquet column pruning want.
    Arrays are left as-is (explode is a semantic choice, not a schema
    one). Pure projection — zero shuffle, column pruning intact."""
    from pyspark.sql.types import StructType
    for _ in range(max_depth):
        struct_fields = [f for f in df.schema.fields
                         if isinstance(f.dataType, StructType)]
        if not struct_fields:
            break
        cols = []
        for f in df.schema.fields:
            if isinstance(f.dataType, StructType):
                cols.extend(
                    F.col(f"`{f.name}`.`{sub.name}`")
                    .alias(f"{f.name}{sep}{sub.name}")
                    for sub in f.dataType.fields)
            else:
                cols.append(F.col(f"`{f.name}`"))
        df = df.select(*cols)
    return df


def parse_json_column(df: DataFrame, col: str, schema: Any = None,
                      out_col: str | None = None,
                      flatten: bool = False) -> DataFrame:
    """Parse a JSON-string column into typed fields (crawl `metadata` /
    event `props` columns). With `schema=None` the schema is derived
    from ONE sampled non-null value (driver-side, single-row job) —
    pass an explicit schema when fields vary across rows, since the
    sample decides for everyone. `flatten=True` splices the parsed
    fields to top level (dropping the source column) instead of
    nesting them under `out_col`.

    Scale: `from_json` is a per-row native expression — zero shuffle,
    whole-stage codegen; only the schema derivation touches the driver
    (one value)."""
    out_col = out_col or f"{col}_parsed"
    if schema is None:
        row = df.select(F.col(col)).filter(F.col(col).isNotNull()).head(1)
        if not row:
            raise ValueError(f"cannot derive a schema: column {col!r} "
                             "has no non-null values; pass schema=")
        sample = row[0][0]
        schema = df.sparkSession.range(1).select(
            F.schema_of_json(F.lit(sample))).head()[0]
    parsed = df.withColumn(out_col, F.from_json(F.col(col), schema))
    if not flatten:
        return parsed
    sub = [f"{out_col}.{f}" for f in
           parsed.select(f"{out_col}.*").columns]
    keep = [c for c in df.columns if c != col]
    return parsed.select(*keep, *sub)
