"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k (exact) — a broadcast of the query set
against the corpus, native zip_with/aggregate arithmetic, per-query top-k
via window. Scale path: IVF-style coarse quantization — assign corpus
vectors to the nearest of K centroids once, then probe only the closest
`nprobe` cells per query (prunes the corpus scan by ~K/nprobe).
No Python in the scoring loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential left-to-right fold — deterministic, matches a SQL
    ordinal-ordered SUM for oracle comparison.

    With `dim` (r9): rows whose arrays have exactly that size take a
    flat unrolled sum that stays inside whole-stage codegen (the
    `aggregate`/`zip_with` fold is CodegenFallback — interpreted per
    element); any other shape keeps the fold branch verbatim, so the
    result is bit-identical on every input (property-tested)."""
    if dim:
        from juliadb_jl_spark.functions._exprutil import col_sql, flat_dot_sql
        asql, bsql = col_sql(a), col_sql(b)
        if asql is not None and bsql is not None:
            return F.expr(flat_dot_sql(asql, bsql, dim))
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(a: Column, dim: int | None = None) -> Column:
    if dim:
        from juliadb_jl_spark.functions._exprutil import (col_sql,
                                                          flat_sqnorm_sql)
        asql = col_sql(a)
        if asql is not None:
            return F.sqrt(F.expr(flat_sqnorm_sql(asql, dim)))
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot_expr(a, b, dim) / (norm_expr(a, dim) * norm_expr(b, dim))


def dot_lit_expr(a: Column, centroid: list[float]) -> Column:
    """dot_expr(a, F.array(*lits), len(centroid)) with the literal
    centroid inlined per index — the generic flat path would repeat the
    whole O(dim) array text per term (O(dim²) SQL).  Bit-identical
    (see _exprutil.flat_dot_lit_sql); falls back to the generic form
    when `a` doesn't round-trip the parser."""
    from juliadb_jl_spark.functions._exprutil import (col_sql,
                                                      flat_dot_lit_sql)
    c = [float(x) for x in centroid]
    asql = col_sql(a)
    if asql is not None:
        return F.expr(flat_dot_lit_sql(asql, c))
    return dot_expr(a, F.array(*[F.lit(x) for x in c]), len(c))


def cosine_lit_expr(a: Column, centroid: list[float]) -> Column:
    """cosine_expr(a, F.array(*lits), len(centroid)), literal-inlined.
    The centroid's norm is a Python-computed double literal — the same
    left-associated Σc² the runtime flat kernel folds to (Catalyst
    constant-folds it anyway) and IEEE sqrt both sides, so the value
    is bit-identical (the prototype_scores precedent)."""
    import math
    c = [float(x) for x in centroid]
    nc = math.sqrt(sum(x * x for x in c))
    return dot_lit_expr(a, c) / (norm_expr(a, len(c)) * F.lit(nc))


def quantize_embeddings(df: DataFrame, vec_col: str = "embedding",
                        bits: int = 8,
                        out_col: str = "q_codes",
                        scale_col: str = "q_scale") -> DataFrame:
    """Symmetric per-vector max-abs integer quantization — the storage
    form ANN indexes ship at scale (int8 codes are 4× smaller than
    float32 and dot products stay SIMD-friendly): code_i =
    floor(x_i / scale + 0.5) with scale = max|x| / (2^(bits-1) - 1),
    dequant x̂_i = code_i * scale.  `floor(x + 0.5)` instead of
    round() — the two engines' round() disagree on tie handling, the
    floor form is the same IEEE double everywhere.  All-zero vectors
    get scale 0 and all-zero codes.

    Scale (100 TB): a pure per-row native transform, zero shuffle,
    no UDF."""
    if not (2 <= bits <= 16):
        raise ValueError(f"bits must be in [2, 16] (got {bits})")
    levels = float(2 ** (bits - 1) - 1)
    v = F.col(vec_col)
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = maxabs / F.lit(levels)
    codes = F.when(
        maxabs > 0,
        F.transform(v, lambda x: F.floor(x.cast("double") / scale + 0.5)
                    .cast("int"))) \
        .otherwise(F.transform(v, lambda x: F.lit(0)))
    return df.withColumn(scale_col, scale).withColumn(out_col, codes)


def dequantize_expr(codes: Column, scale: Column) -> Column:
    """Reconstruct the (lossy) float vector from quantized codes."""
    return F.transform(codes, lambda c: c.cast("double") * scale)


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str | None = None, q_vec_col: str | None = None) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query set is broadcast (it's the small side); the corpus scan stays
    partitioned — at 100 TB this is one pass, no shuffle of the corpus.
    Ties broken by neighbor id for determinism. Self-matches excluded when
    ids share a namespace."""
    q_id_col = q_id_col or id_col
    q_vec_col = q_vec_col or vec_col
    q = queries.select(F.col(q_id_col).alias("query_id"),
                       F.col(q_vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("__cv"))
    scored = (c.crossJoin(F.broadcast(q))
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      cosine_expr(F.col("__cv").cast("array<double>"),
                                  F.col("__qv").cast("array<double>"))
                      .alias("cosine")))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                          F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def ivf_build(corpus: DataFrame, n_cells: int = 16, id_col: str = "vec_id",
              vec_col: str = "embedding", seed: int = 42,
              iters: int = 2) -> tuple[DataFrame, list[list[float]]]:
    """IVF index: k-means-ish centroids (sampled init, `iters` Lloyd steps
    computed distributed), corpus tagged with nearest-cell id.
    Returns (tagged corpus, centroids). At deploy scale the tagged corpus
    is written `partitionBy("cell")` so probes prune whole partitions.

    Init sample: the rows with the smallest seeded hash_unit(id) values
    (a distributed TakeOrdered) — deterministic across partition layouts
    and cluster sizes, unlike `limit`, which takes whatever partition
    answers first."""
    import numpy as np
    from juliadb_jl_spark.functions.sampling import hash_unit
    n_init = max(n_cells * 20, 200)
    pdf = (corpus.select(F.col(vec_col),
                         hash_unit(F.col(id_col), seed).alias("__u"))
           .orderBy("__u").limit(n_init).toPandas())
    vecs = np.array([list(v) for v in pdf[vec_col]], dtype="float64")
    rng = np.random.RandomState(seed)
    centroids = vecs[rng.choice(len(vecs), size=n_cells, replace=False)]
    dim = centroids.shape[1]
    for _ in range(iters):
        tagged = _assign_cells(corpus, centroids, vec_col)
        agg = (tagged.groupBy("cell")
               .agg(*[F.avg(F.col(vec_col)[i]).alias(f"c{i}")
                      for i in range(dim)],
                    F.count(F.lit(1)).alias("n")).collect())
        for row in agg:
            centroids[row["cell"]] = [row[f"c{i}"] for i in range(dim)]
    tagged = _assign_cells(corpus, centroids, vec_col)
    return tagged, centroids.tolist()


def _assign_cells(df: DataFrame, centroids, vec_col: str) -> DataFrame:
    """Nearest-centroid assignment as an Arrow-vectorized pandas UDF: one
    numpy matmul per batch.  (A native when-chain over n_cells×dim literal
    arrays generates megabytes of codegen and runs orders slower.)"""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cents = np.asarray(centroids, dtype="float64")
    cnorm = np.linalg.norm(cents, axis=1) + 1e-12

    def _nearest(vs):
        M = np.array([np.asarray(v, dtype="float64") for v in vs])
        sims = (M @ cents.T) / (np.linalg.norm(M, axis=1, keepdims=True) + 1e-12) / cnorm
        return pd.Series(np.argmax(sims, axis=1).astype("int32"))

    # legacy-style pandas_udf: annotations are strings under
    # `from __future__ import annotations` and pyspark can't resolve them
    nearest = F.pandas_udf(_nearest, T.IntegerType())
    return df.withColumn("cell", nearest(F.col(vec_col).cast("array<double>")))


def ivf_save(tagged_corpus: DataFrame, centroids, path: str,
             mode: str = "overwrite") -> None:
    """Persist the IVF index partitioned by cell: probes then read only
    nprobe/n_cells of the data via partition pruning — the 100 TB layout."""
    import json
    import os
    tagged_corpus.write.mode(mode).partitionBy("cell").parquet(path)
    with open(os.path.join(path, "_ivf_centroids.json"), "w") as fh:
        json.dump(centroids, fh)


def ivf_load(spark, path: str):
    import json
    import os
    with open(os.path.join(path, "_ivf_centroids.json")) as fh:
        centroids = json.load(fh)
    return spark.read.parquet(path), centroids


def ivf_topk(tagged_corpus: DataFrame, centroids, queries: DataFrame,
             k: int = 5, nprobe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", q_id_col: str | None = None) -> DataFrame:
    """ANN top-k: per query, score only the `nprobe` nearest cells.
    Corpus partitioned/bucketed by cell → partition pruning does the work.

    Scale assumption (by design): the QUERY set is collected to the
    driver to route queries to cells — this is the top-k *serving* shape
    (queries ≪ corpus; thousands, not billions). For query sets too big
    for the driver, cross-join queries to centroids distributed and take
    per-query nprobe mins instead."""
    import numpy as np
    q_id_col = q_id_col or id_col
    qpdf = queries.select(F.col(q_id_col).alias("query_id"),
                          F.col(vec_col).alias("qv")).toPandas()
    cents = np.array(centroids)
    cnorm = np.linalg.norm(cents, axis=1)
    rows = []
    for _, r in qpdf.iterrows():
        qv = np.array(list(r["qv"]), dtype="float64")
        sims = cents @ qv / (cnorm * np.linalg.norm(qv) + 1e-12)
        for cell in np.argsort(-sims)[:nprobe]:
            rows.append((int(r["query_id"]), int(cell), [float(x) for x in qv]))
    spark = tagged_corpus.sparkSession
    probe = spark.createDataFrame(rows, "query_id long, cell int, qv array<double>")
    joined = tagged_corpus.join(F.broadcast(probe), "cell")
    scored = (joined.filter(F.col(id_col) != F.col("query_id"))
              .select("query_id", F.col(id_col).alias("neighbor_id"),
                      cosine_expr(F.col(vec_col).cast("array<double>"),
                                  F.col("qv"),
                                  int(cents.shape[1])).alias("cosine")))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                          F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def recall_report(approx: DataFrame, exact: DataFrame,
                  k: int | None = None) -> DataFrame:
    """Index-QA table for an ANN configuration: per-query recall@k of
    an approximate top-k result against the exhaustive one, plus a
    one-row summary join-key ('__all'). Both inputs are
    (query_id, neighbor_id[, ...]) as produced by `ivf_topk` /
    `cosine_topk`; pass `k` to truncate both sides by their `rank`
    column first. This is the number that picks nprobe/n_cells before
    an index serves a 100 TB corpus.

    Returns (query_id, n_exact, n_hit, recall) with one extra row
    query_id NULL carrying the macro-average.

    Scale: both inputs are query-set-sized (k rows per query) — the
    comparison is a result-table join, never a corpus operation."""
    if k is not None:
        approx = approx.filter(F.col("rank") <= k)
        exact = exact.filter(F.col("rank") <= k)
    a = approx.select("query_id", "neighbor_id").withColumn(
        "__hit", F.lit(1))
    e = exact.select("query_id", "neighbor_id")
    per = (e.join(a, ["query_id", "neighbor_id"], "left")
           .groupBy("query_id")
           .agg(F.count(F.lit(1)).alias("n_exact"),
                F.sum(F.coalesce("__hit", F.lit(0))).alias("n_hit"))
           .withColumn("recall", F.col("n_hit") / F.col("n_exact")))
    summary = per.agg(
        F.lit(None).cast(per.schema["query_id"].dataType)
        .alias("query_id"),
        F.sum("n_exact").alias("n_exact"), F.sum("n_hit").alias("n_hit"),
        F.avg("recall").alias("recall"))
    return per.unionByName(summary)
