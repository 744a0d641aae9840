"""ML feature extraction (reference src/ml.jl).

`ml_schema` ≙ ML.schema: per-column stats — Continuous → (mean, std),
Categorical → distinct values, Maybe → null handling (reference
src/ml.jl:20-102).  `featuremat` ≙ ML.featuremat (src/ml.jl:159-177):
standardized continuous (native projection from the one-pass schema
stats) + null-indicator (Maybe) + one-hot categorical (StringIndexer/
OneHotEncoder/VectorAssembler) — distributed, no driver-side
materialization.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from juliadb_jl_spark.plans.table import Table

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType)


def ml_schema(t: Table, hints: dict[str, str] | None = None) -> dict[str, dict]:
    """Column stats, one distributed pass: numeric → Continuous(mean, std,
    nnulls), string/bool → Categorical(distinct count, nnulls).  `hints`
    forces a column to 'continuous'/'categorical' (reference ML.schema
    hints, docs/src/ml.md:40-55)."""
    hints = hints or {}
    cont, cat = [], []
    for f in t.df.schema.fields:
        kind = hints.get(f.name)
        if kind == "ignore":
            continue
        if kind == "continuous" or (kind is None and isinstance(f.dataType, _NUMERIC)):
            cont.append(f.name)
        else:
            cat.append(f.name)
    aggs = []
    for c in cont:
        aggs += [F.avg(c).alias(f"__m_{c}"), F.stddev_samp(c).alias(f"__s_{c}"),
                 F.sum(F.col(c).isNull().cast("long")).alias(f"__n_{c}")]
    for c in cat:
        aggs += [F.count_distinct(c).alias(f"__d_{c}"),
                 F.sum(F.col(c).isNull().cast("long")).alias(f"__n_{c}")]
    row = t.df.agg(*aggs).head(1)[0].asDict() if aggs else {}
    out: dict[str, dict] = {}
    for c in cont:
        out[c] = {"kind": "continuous", "mean": row[f"__m_{c}"],
                  "std": row[f"__s_{c}"], "nulls": row[f"__n_{c}"]}
    for c in cat:
        out[c] = {"kind": "categorical", "ndistinct": row[f"__d_{c}"],
                  "nulls": row[f"__n_{c}"]}
    return out


def featuremat(t: Table, hints: dict[str, str] | None = None,
               output_col: str = "features") -> DataFrame:
    """Standardized/one-hot feature matrix as a Spark ML vector column
    (reference ML.featuremat, src/ml.jl:159-177). Continuous →
    (x - mean)/std with mean/std over the OBSERVED values only (nulls
    skipped), nulls imputed to z=0 plus a null-indicator feature
    (ML.Maybe, src/ml.jl:104-157, test/test_ml.jl:21-22); categorical →
    StringIndexer + OneHotEncoder. Standardization is a native
    projection from the ml_schema stats — no second fitting pass over
    the data. Returns the input DF + `features`."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import (OneHotEncoder, StringIndexer,
                                    VectorAssembler)

    schema = ml_schema(t, hints)
    cont = [c for c, s in schema.items() if s["kind"] == "continuous"]
    cat = [c for c, s in schema.items() if s["kind"] == "categorical"]

    df = t.df
    z_cols, na_cols = [], []
    for c in cont:
        if schema[c]["nulls"]:
            df = df.withColumn(f"__na_{c}", F.col(c).isNull().cast("double"))
            na_cols.append(f"__na_{c}")
        m, s = schema[c]["mean"], schema[c]["std"]
        if s:  # std None (n<2) or 0 (constant) → feature is all zeros
            z = (F.coalesce(F.col(c).cast("double"), F.lit(float(m)))
                 - F.lit(float(m))) / F.lit(float(s))
        else:
            z = F.lit(0.0)
        df = df.withColumn(f"__z_{c}", z)
        z_cols.append(f"__z_{c}")
    stages = []
    enc_cols = []
    for c in cat:
        stages.append(StringIndexer(inputCol=c, outputCol=f"__i_{c}",
                                    handleInvalid="keep", stringOrderType="alphabetAsc"))
        stages.append(OneHotEncoder(inputCol=f"__i_{c}", outputCol=f"__o_{c}",
                                    dropLast=False))
        enc_cols.append(f"__o_{c}")
    assembled_inputs = z_cols + na_cols + enc_cols
    stages.append(VectorAssembler(inputCols=assembled_inputs, outputCol=output_col))
    model = Pipeline(stages=stages).fit(df)
    out = model.transform(df)
    return out.drop(*[c for c in out.columns if c.startswith("__")])


# ---------------------------------------------------------------------------
# Nearest-centroid classification (model-based quality/label scoring)
# ---------------------------------------------------------------------------

def class_centroids(df: DataFrame, vec_col: str,
                    label_col: str) -> dict[Any, list[float]]:
    """Per-class mean vectors (the 'training' pass of a nearest-centroid
    classifier) in ONE distributed aggregation: posexplode the vectors,
    groupBy (label, dim) with map-side partial avg, collect the
    classes×dim means (tiny — e.g. 10×64 doubles) to the driver.

    The corpus is touched once; no Python in the loop."""
    per_dim = (df.select(F.col(label_col).alias("__l"),
                         F.posexplode(vec_col).alias("__p", "__x"))
               .groupBy("__l", "__p").agg(F.avg("__x").alias("__m")))
    rows = (per_dim.groupBy("__l")
            .agg(F.array_sort(F.collect_list(F.struct("__p", "__m")))
                 .alias("pm"))
            .collect())
    return {r["__l"]: [pm["__m"] for pm in r["pm"]] for r in rows}


def centroid_scores(df: DataFrame, vec_col: str,
                    centroids: dict[Any, list[float]],
                    label_out: str = "class_label",
                    score_out: str = "cosine") -> DataFrame:
    """Cosine of every row's vector against every class centroid — the
    scoring pass of a nearest-centroid classifier, and the shape of any
    fixed-linear-model quality scorer at 100 TB: centroids ride into the
    plan as literal arrays (broadcast with the task binary), the corpus
    streams through ONE native projection, zero shuffle, zero Python.

    Output: one row per (input row, class): all input columns except
    `vec_col`, plus `label_out` and `score_out`."""
    from juliadb_jl_spark.functions.similarity import cosine_lit_expr
    structs = []
    for lbl in sorted(centroids):
        structs.append(F.struct(
            F.lit(lbl).alias(label_out),
            cosine_lit_expr(F.col(vec_col).cast("array<double>"),
                            centroids[lbl])
            .alias(score_out)))
    keep = [c for c in df.columns if c != vec_col]
    return df.select(*keep, F.explode(F.array(*structs)).alias("__sc")) \
        .select(*keep, f"__sc.{label_out}", f"__sc.{score_out}")


def nearest_centroid_classify(df: DataFrame, vec_col: str,
                              centroids: dict[Any, list[float]],
                              pred_col: str = "pred") -> DataFrame:
    """Predicted class = argmax cosine over the centroid set (ties break
    toward the smaller label; array-argmax shape, same codegen-safe
    pattern as text.lang_id). One native projection, zero shuffle."""
    from juliadb_jl_spark.functions.similarity import cosine_lit_expr
    labels = sorted(centroids)
    cos = [cosine_lit_expr(F.col(vec_col).cast("array<double>"),
                           centroids[lbl])
           for lbl in labels]
    arr = F.array(*cos)
    idx = F.array_position(arr, F.array_max(arr)).cast("int")
    pred = F.element_at(F.array(*[F.lit(lbl) for lbl in labels]), idx)
    return df.withColumn(pred_col, pred)
