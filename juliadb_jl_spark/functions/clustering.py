"""Distributed k-means document clustering + cluster-based curation.

The cluster-then-curate stage of a training-data pipeline: partition the
corpus by embedding similarity (Lloyd's algorithm), then act per cluster —
balanced sampling for diversity-preserving subsets, prototypicality
pruning (drop the most/least typical members of each cluster). Public
references: SemDeDup (Abbas et al. 2023) clusters before pruning;
Sorscher et al. 2022 prune by distance-to-prototype; D4 (Tirumala et al.
2023) composes both.

Scale shape:
- `kmeans_fit`: per iteration ONE pass over the cached vector frame plus
  a (k·dim)-row aggregation — the corpus is never shuffled; centroids are
  k·dim floats on the driver (8 MB at k=1024, dim=1024).
- Assignment is an unrolled native expression per centroid (one
  zip_with/aggregate fold each — whole-stage codegen, no Python), the
  same shape as `similarity.cosine_expr`. Appropriate for k up to a few
  hundred; for thousands of cells use `similarity.ivf_build`'s
  Arrow-batched numpy path (same semantics, vectorized argmin).
- `cluster_sample` / `prototype_prune` add one k-row aggregate broadcast
  back over the assignment — no extra corpus shuffle.

Determinism: init is the vectors of the k smallest ids (a distributed
TakeOrdered), so fit/assign/sample/prune are reproducible across
partition layouts and engines — the driver queries (q9l–q9n) oracle-check
the whole pipeline against DuckDB with the Lloyd iterations unrolled as
SQL CTEs.

Reference parity note: the reference engine (JuliaDB) has no clustering
surface; this extends it the same way the dedup/similarity family does
(SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from juliadb_jl_spark.functions.similarity import dot_expr, norm_expr


def sq_dist_expr(vec: Column, centroid: list[float]) -> Column:
    """Squared Euclidean distance from `vec` (array<double>) to a literal
    centroid — a single sequential left-to-right fold, matching the
    ordinal-ordered SQL sum for oracle comparison.

    r9: the centroid's length is the dimension, so vectors of exactly
    that size take a flat unrolled codegen sum (the fold is interpreted
    per element — the portable_hash cliff class); other shapes keep the
    fold verbatim.  Bit-identical on every input, ONE parsed SQL
    expression per centroid (the Column construction was ~6 py4j round
    trips per coordinate)."""
    from juliadb_jl_spark.functions._exprutil import col_sql, flat_sqdist_sql
    vsql = col_sql(vec)
    if vsql is not None:
        return F.expr(flat_sqdist_sql(vsql, [float(x) for x in centroid]))
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(F.zip_with(vec, lit, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, x: acc + x)


def _cast_vec(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn("__v", F.col(vec_col).cast("array<double>"))


def kmeans_init(df: DataFrame, k: int, id_col: str = "vec_id",
                vec_col: str = "embedding") -> list[list[float]]:
    """Deterministic init: the vectors of the k smallest ids (distributed
    TakeOrdered — stable across partition layouts, unlike `limit`)."""
    rows = (_cast_vec(df, vec_col).select(id_col, "__v")
            .orderBy(id_col).limit(k).collect())
    if len(rows) < k:
        raise ValueError(f"k={k} but only {len(rows)} rows")
    return [list(r["__v"]) for r in rows]


def assign_expr(vec: Column, centroids: list[list[float]]) -> tuple[Column, Column]:
    """(cell, sq_dist) columns for the nearest centroid. Ties break to the
    lowest cell index (array_position finds the first minimum)."""
    darr = F.array(*[sq_dist_expr(vec, c) for c in centroids])
    cell = (F.array_position(darr, F.array_min(darr)) - 1).cast("int")
    return cell, F.array_min(darr)


def kmeans_assign(df: DataFrame, centroids: list[list[float]],
                  vec_col: str = "embedding") -> DataFrame:
    """Tag each row with its nearest centroid: + `cell` (int), + `dist`
    (Euclidean). One corpus pass, no shuffle, no Python."""
    out = _cast_vec(df, vec_col)
    cell, sq = assign_expr(F.col("__v"), centroids)
    return (out.withColumn("cell", cell)
            .withColumn("dist", F.sqrt(sq)).drop("__v"))


def kmeans_fit(df: DataFrame, k: int, iters: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding",
               init: list[list[float]] | None = None) -> list[list[float]]:
    """Lloyd's algorithm: `iters` rounds of (assign to nearest centroid,
    recompute centroids as per-cell coordinate means). A cell that loses
    all members keeps its previous centroid.

    Scale: the id-free vector frame is cached once; each iteration is one
    scan + a (k·dim)-row avg aggregation (map-side combinable) collected
    to the driver. Iteration count is the caller's trade — 2 is usually
    enough ahead of cluster-RELATIVE operations (sampling, pruning)."""
    cents = [list(map(float, c)) for c in init] if init is not None \
        else kmeans_init(df, k, id_col, vec_col)
    if len(cents) != k:
        raise ValueError(f"init has {len(cents)} centroids, expected {k}")
    dim = len(cents[0])
    # actions complete in-function → persist/unpersist inline (no scratch);
    # spread first: single-file inputs arrive as ONE partition and would
    # serialize every per-iteration distance fold in one task
    from juliadb_jl_spark.functions.dedup import _spread
    v = _spread(_cast_vec(df, vec_col).select("__v")).persist()
    try:
        # recompute = one avg aggregate PER DIMENSION (wide, native,
        # map-side combinable) — a posexplode to (cell, idx, x) rows was
        # 25× slower at the sf10 rung (12.8M generated rows vs zero)
        aggs = [F.avg(F.col("__v")[i]).alias(f"m{i}") for i in range(dim)]
        for _ in range(iters):
            cell, _sq = assign_expr(F.col("__v"), cents)
            means = v.groupBy(cell.alias("cell")).agg(*aggs).collect()
            nxt = [list(c) for c in cents]  # empty cells keep old centroid
            for r in means:
                nxt[r["cell"]] = [float(r[f"m{i}"]) for i in range(dim)]
            cents = nxt
        return cents
    finally:
        v.unpersist()


def cluster_sample(df: DataFrame, centroids: list[list[float]],
                   n_per_cell: int, id_col: str = "vec_id",
                   vec_col: str = "embedding", seed: int = 5) -> DataFrame:
    """Cluster-balanced subsample: target ~`n_per_cell` rows per cell via
    a per-cell rate filter on the deterministic `hash_unit` (rate =
    min(1, n_per_cell / |cell|)). Rate-based rather than rank-based on
    purpose: membership is decided row-locally (append-stable, no
    per-cell global sort — a rank window over a 100-TB cell is a sort;
    this is a k-row aggregate + broadcast + filter). Output size is
    n_per_cell in expectation per cell, exact only when a cell is kept
    whole."""
    from juliadb_jl_spark.functions.sampling import hash_unit
    a = kmeans_assign(df, centroids, vec_col)
    cnt = a.groupBy("cell").agg(F.count(F.lit(1)).alias("__n"))
    rate = F.least(F.lit(1.0), F.lit(float(n_per_cell)) / F.col("__n"))
    return (a.join(F.broadcast(cnt.select("cell", rate.alias("__rate"))),
                   "cell")
            .filter(hash_unit(F.col(id_col), seed) < F.col("__rate"))
            .drop("__rate"))


def centroids_save(spark, centroids: list[list[float]], path: str) -> None:
    """Persist fitted centroids as parquet (one row per cell) — the
    fit-once / assign-forever artifact: tomorrow's ingest batches score
    against today's centroids without re-fitting (same shape as
    bpe_save / classifier.model_save)."""
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    spark.createDataFrame(rows, "cell int, centroid array<double>") \
        .coalesce(1).write.mode("overwrite").parquet(path)


def centroids_load(spark, path: str) -> list[list[float]]:
    rows = spark.read.parquet(path).collect()
    by_cell = {r["cell"]: list(r["centroid"]) for r in rows}
    return [by_cell[i] for i in range(len(by_cell))]


def cluster_pairs_exact(df: DataFrame, centroids: list[list[float]],
                        threshold: float = 0.95, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        margin: float = 1e-6) -> DataFrame:
    """All SAME-CELL cosine-≥-threshold pairs, exactly: assign cells,
    then one Arrow-batched numpy matmul per cell group — candidate
    generation is O(Σ|cell|²) instead of O(n²), which is the whole
    point of clustering first (SemDeDup runs k in the thousands so
    cells stay small). Candidates use a margin-padded threshold, then
    the survivors — O(matching pairs) — are re-scored with the native
    sequential-fold cosine (bit-identical to the SQL oracle), with the
    vector lookup pruned to matched ids via broadcast semi-joins: the
    corpus itself is never shuffled.

    Memory: the per-cell similarity is row-blocked (1024-row strips ×
    cell matrix), so a task holds one cell's vectors + one strip of
    scores — a 50k-vector cell at dim 64 is ~25 MB + 400 MB strip."""
    import numpy as np
    import pandas as pd
    from juliadb_jl_spark.functions.similarity import cosine_expr

    keyed = _cast_vec(df, vec_col).select(F.col(id_col).alias("id"),
                                          F.col("__v").alias("v"))
    cell, _sq = assign_expr(F.col("v"), centroids)
    tagged = keyed.withColumn("__cell", cell)
    id_t = df.schema[id_col].dataType.simpleString()
    thr = threshold - margin

    def gen(_key, p):
        M = np.array([np.asarray(v, dtype="float64") for v in p["v"]])
        Mn = M / (np.linalg.norm(M, axis=1, keepdims=True) + 1e-300)
        ids = p["id"].to_numpy()
        out = []
        for lo in range(0, len(ids), 1024):
            strip = Mn[lo:lo + 1024]
            mask = (strip @ Mn.T >= thr) & \
                (ids[lo:lo + 1024, None] < ids[None, :])
            r, c = np.nonzero(mask)
            out.append(pd.DataFrame({"id_a": ids[lo + r], "id_b": ids[c]}))
        return pd.concat(out) if out else \
            pd.DataFrame({"id_a": ids[:0], "id_b": ids[:0]})

    par = df.sparkSession.sparkContext.defaultParallelism
    cand = (tagged.repartition(par, "__cell").groupBy("__cell")
            .applyInPandas(gen, f"id_a {id_t}, id_b {id_t}"))
    m_ids = (cand.select(F.col("id_a").alias("id"))
             .union(cand.select(F.col("id_b").alias("id"))).distinct())
    mv = keyed.join(F.broadcast(m_ids), "id", "left_semi")
    va = mv.select(F.col("id").alias("id_a"), F.col("v").alias("__va"))
    vb = mv.select(F.col("id").alias("id_b"), F.col("v").alias("__vb"))
    return (cand.join(F.broadcast(va), "id_a").join(F.broadcast(vb), "id_b")
            .withColumn("cosine", cosine_expr(F.col("__va"), F.col("__vb"),
                                              len(centroids[0])))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def cluster_semantic_dedup(df: DataFrame, centroids: list[list[float]],
                           threshold: float = 0.95, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """SemDeDup as published (Abbas et al. 2023): k-means the corpus,
    find cosine-≥-threshold pairs WITHIN each cluster only, resolve
    transitive duplicate groups, keep the smallest-id representative.
    Cross-cluster near-dups are invisible by design — that recall loss
    (small for large k) is the price of O(Σ|cell|²) pair generation.
    With k=1 this is exactly `dedup.semantic_dedup(exact=True)`
    (property-tested). Composition: unique-vector lift →
    `cluster_pairs_exact` on reps → `dedup.dedup_by_clusters`.

    Unique-vector lift: identical vectors are cosine-1 duplicates by
    definition (threshold ≤ 1) and share a cell (assignment is value-
    determined), so each identical group collapses to its min-id rep
    before pair generation and lifts back as rep→member star edges —
    component-equivalent, O(members) instead of O(members²). Without it
    a 100-member replicated clique contributes C(100,2) intra pairs
    (measured: the sf10 rung's 2000×100-member cliques pushed the
    un-lifted form past 10 minutes; lifted it is seconds). Cost when
    the corpus is unique: one extra (id, vec) shuffle — linear, and the
    same observed-blowup trade as the jaccard/minhash lifts."""
    from pyspark.sql import Window as W
    from juliadb_jl_spark.functions.dedup import dedup_by_clusters
    keyed = _cast_vec(df, vec_col).select(F.col(id_col).alias("id"),
                                          F.col("__v").alias("v"))
    # xxhash prefix keeps the shuffle key narrow; full vector equality
    # rides along so collisions cannot merge distinct vectors
    w = W.partitionBy(F.xxhash64("v"), "v")
    tagged = keyed.withColumn("__rep", F.min("id").over(w))
    star = (tagged.filter(F.col("id") != F.col("__rep"))
            .select(F.col("__rep").alias("id_a"), F.col("id").alias("id_b")))
    reps = (tagged.filter(F.col("id") == F.col("__rep"))
            .select(F.col("id").alias(id_col), F.col("v").alias(vec_col)))
    pairs = cluster_pairs_exact(reps, centroids, threshold, id_col, vec_col)
    edges = pairs.select("id_a", "id_b").union(star)
    return dedup_by_clusters(df, edges, id_col)


def prototype_scores(df: DataFrame, centroids: list[list[float]],
                     vec_col: str = "embedding") -> DataFrame:
    """+ `cell`, + `proto` = cosine(vec, centroid(cell)) — how typical
    the row is of its own cluster (1 = sits on the prototype)."""
    a = _cast_vec(kmeans_assign(df, centroids, vec_col), vec_col)
    from juliadb_jl_spark.functions.similarity import dot_lit_expr
    cos = [dot_lit_expr(F.col("__v"), c)
           / (norm_expr(F.col("__v"), len(c))
              * F.lit(float(sum(x * x for x in c) ** 0.5)))
           for c in centroids]
    proto = F.array(*cos)[F.col("cell")]
    return a.withColumn("proto", proto).drop("__v")


def prototype_prune(df: DataFrame, centroids: list[list[float]],
                    frac: float = 0.25, keep: str = "far",
                    vec_col: str = "embedding") -> DataFrame:
    """Per-cluster prototypicality pruning: drop the fraction `frac` of
    each cell nearest its centroid (`keep="far"` — Sorscher-style: the
    most prototypical examples are the most redundant) or farthest
    (`keep="near"` — outlier/noise removal).

    The threshold is the exact per-cell `frac`-quantile of the cosine
    score (k rows, broadcast back). Exact percentile aggregates the
    cell's score list — the oracle-checkable path; at 100 TB swap
    `F.percentile` for `F.approx_percentile` (same plan shape, sketched
    state). Rows exactly AT the threshold are kept."""
    if keep not in ("far", "near"):
        raise ValueError("keep must be 'far' or 'near'")
    s = prototype_scores(df, centroids, vec_col)
    # drop the top `frac` by proto ("far": redundancy pruning) → keep
    # everything at or below the (1-frac)-quantile; "near" is the mirror.
    q = 1.0 - frac if keep == "far" else frac
    thr = s.groupBy("cell").agg(
        F.percentile(F.col("proto"), F.lit(q)).alias("__thr"))
    out = s.join(F.broadcast(thr), "cell")
    cond = (F.col("proto") <= F.col("__thr")) if keep == "far" \
        else (F.col("proto") >= F.col("__thr"))
    return out.filter(cond).drop("__thr")
