"""k-means clustering + cluster-based curation (functions/clustering.py):
distributed Lloyd ≡ a local numpy reference under identical deterministic
init; partition invariance; empty-cell semantics; sampling and pruning
against local recomputation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from juliadb_jl_spark.functions import clustering as KM
from juliadb_jl_spark.functions.sampling import hash_unit


def _mk(spark, n=60, dim=8, seed=3):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dim).astype("float64")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return (spark.createDataFrame(rows, ["vec_id", "embedding"]), vecs)


def _lloyd_local(vecs: np.ndarray, k: int, iters: int):
    """Textbook Lloyd with min-id init and keep-old-on-empty — the
    contract kmeans_fit implements."""
    cents = vecs[:k].copy()
    for _ in range(iters):
        d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cell = d.argmin(axis=1)
        for c in range(k):
            m = vecs[cell == c]
            if len(m):
                cents[c] = m.mean(axis=0)
    return cents


def _assign_local(vecs: np.ndarray, cents: np.ndarray):
    d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), np.sqrt(d.min(axis=1))


def test_fit_matches_local_lloyd(spark):
    df, vecs = _mk(spark)
    got = np.array(KM.kmeans_fit(df, k=4, iters=3))
    want = _lloyd_local(vecs, 4, 3)
    assert np.allclose(got, want, atol=1e-9)


def test_assign_matches_local(spark):
    df, vecs = _mk(spark)
    cents = KM.kmeans_fit(df, k=4, iters=2)
    rows = KM.kmeans_assign(df, cents).select("vec_id", "cell", "dist") \
        .collect()
    cell, dist = _assign_local(vecs, np.array(cents))
    for r in rows:
        assert r["cell"] == cell[r["vec_id"]]
        assert abs(r["dist"] - dist[r["vec_id"]]) < 1e-9


def test_fit_partition_invariant(spark):
    df, _ = _mk(spark)
    c1 = KM.kmeans_fit(df.coalesce(1), k=3, iters=2)
    c8 = KM.kmeans_fit(df.repartition(8), k=3, iters=2)
    # avg partial-sum order differs across layouts → tiny fp drift only
    assert np.allclose(np.array(c1), np.array(c8), atol=1e-9)


def test_empty_cell_keeps_previous_centroid(spark):
    # two tight blobs, k=3: min-id init puts centroids 0,1 in blob A and
    # centroid 2 in blob B; after one step a centroid loses all members
    # and must keep its previous position (numpy ref encodes the same).
    pts = np.array([[0.0, 0.0], [0.1, 0.0], [0.05, 0.05],
                    [10.0, 10.0], [10.1, 10.0], [10.0, 10.1]])
    rows = [(i, [float(x) for x in p]) for i, p in enumerate(pts)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = np.array(KM.kmeans_fit(df, k=3, iters=2))
    want = _lloyd_local(pts, 3, 2)
    assert np.allclose(got, want, atol=1e-12)


def test_cluster_sample_matches_local_rule(spark):
    df, vecs = _mk(spark, n=80)
    cents = KM.kmeans_fit(df, k=3, iters=2)
    kept = sorted(r["vec_id"] for r in
                  KM.cluster_sample(df, cents, 10, seed=5).collect())
    # local recompute: same assignment, same counts, same hash rule
    cell, _ = _assign_local(vecs, np.array(cents))
    cnt = np.bincount(cell, minlength=3)
    u = {r["vec_id"]: r["u"] for r in
         df.select("vec_id", hash_unit(F.col("vec_id"), 5).alias("u"))
         .collect()}
    want = sorted(i for i in range(80)
                  if u[i] < min(1.0, 10 / cnt[cell[i]]))
    assert kept == want


def test_cluster_sample_keeps_small_cells_whole(spark):
    df, vecs = _mk(spark, n=30)
    cents = KM.kmeans_fit(df, k=3, iters=1)
    kept = KM.cluster_sample(df, cents, 1000).count()
    assert kept == 30  # rate clamps at 1 → everything survives


def test_prototype_prune_drops_top_frac(spark):
    df, vecs = _mk(spark, n=100)
    cents = KM.kmeans_fit(df, k=4, iters=2)
    scores = {(r["vec_id"]): (r["cell"], r["proto"]) for r in
              KM.prototype_scores(df, cents).select(
                  "vec_id", "cell", "proto").collect()}
    kept = {r["vec_id"] for r in
            KM.prototype_prune(df, cents, frac=0.25, keep="far").collect()}
    # per-cell: kept = proto <= exact linear-interpolated 0.75-quantile
    for c in range(4):
        vals = sorted(p for (cc, p) in scores.values() if cc == c)
        thr = float(np.percentile(vals, 75, method="linear"))
        want = {i for i, (cc, p) in scores.items()
                if cc == c and p <= thr + 1e-12}
        got = {i for i in kept if scores[i][0] == c}
        assert got == want
    # roughly 75% survives overall
    assert 60 <= len(kept) <= 85


def test_prototype_prune_near_mode_is_mirror(spark):
    df, _ = _mk(spark, n=50)
    cents = KM.kmeans_fit(df, k=2, iters=1)
    far = {r["vec_id"] for r in
           KM.prototype_prune(df, cents, 0.2, keep="far").collect()}
    near = {r["vec_id"] for r in
            KM.prototype_prune(df, cents, 0.2, keep="near").collect()}
    # "far" keeps the low-proto end, "near" keeps the high-proto end;
    # together they cover everything (thresholds overlap at the boundary)
    assert len(far | near) == 50
    assert pytest.raises(ValueError, KM.prototype_prune, df, cents, 0.2,
                         "sideways")


def test_assignment_plan_is_shuffle_free(spark):
    df, _ = _mk(spark)
    cents = KM.kmeans_fit(df, k=3, iters=1)
    plan = KM.kmeans_assign(df, cents)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_cluster_pairs_match_local(spark):
    df, vecs = _mk(spark, n=70, dim=6, seed=9)
    cents = KM.kmeans_fit(df, k=3, iters=2)
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in
           KM.cluster_pairs_exact(df, cents, threshold=0.5).collect()}
    cell, _ = _assign_local(vecs, np.array(cents))
    Vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    S = Vn @ Vn.T
    want = {(i, j) for i in range(70) for j in range(i + 1, 70)
            if cell[i] == cell[j] and S[i, j] >= 0.5 - 1e-9}
    assert set(got) == want
    for (i, j), c in got.items():
        assert abs(c - S[i, j]) < 1e-9


def test_cluster_semantic_dedup_k1_equals_exact_semantic_dedup(spark):
    from juliadb_jl_spark.functions import dedup as DD
    df, vecs = _mk(spark, n=50, dim=6, seed=11)
    # k=1: every row in one cell -> identical to the unclustered exact op
    cents = KM.kmeans_fit(df, k=1, iters=1)
    got = sorted(r["vec_id"] for r in
                 KM.cluster_semantic_dedup(df, cents, 0.6).collect())
    want = sorted(r["vec_id"] for r in
                  DD.semantic_dedup(df, "vec_id", "embedding", 0.6,
                                    exact=True).collect())
    assert got == want


def test_cluster_semantic_dedup_identical_vector_clique(spark):
    # a 10-member identical-embedding clique collapses to its min id;
    # unique vectors far from everything pass through untouched
    base = np.eye(4)[0]
    rows = [(i, [float(x) for x in base]) for i in range(10)]
    # three mutually-orthogonal singletons (cos=0 pairwise and vs clique)
    rows += [(100 + i, [float(x) for x in np.eye(4)[i + 1]])
             for i in range(3)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = KM.kmeans_fit(df, k=2, iters=2)
    kept = sorted(r["vec_id"] for r in
                  KM.cluster_semantic_dedup(df, cents, 0.99).collect())
    assert 0 in kept and all(i not in kept for i in range(1, 10))
    assert {100, 101, 102} <= set(kept)


def test_cluster_scoring_runs_on_streams(spark, tmp_path):
    """Assignment and prototype scoring against FITTED centroids are
    stateless Column maps — the same code runs under Structured
    Streaming (score each arriving batch against yesterday's fit)."""
    import pandas as pd
    from juliadb_jl_spark.streaming.aggregate import (run_to_memory,
                                                      stream_from_parquet)
    df, _ = _mk(spark, n=40)
    cents = KM.kmeans_fit(df, k=3, iters=2)
    src = str(tmp_path / "vec_src")
    df.write.parquet(src)

    def score(d):
        return KM.prototype_scores(d, cents).select(
            "vec_id", "cell", "proto")

    batch = score(spark.read.parquet(src)).toPandas() \
        .sort_values("vec_id", ignore_index=True)
    streamed = run_to_memory(score(stream_from_parquet(spark, src)),
                             "km_stream", mode="append").toPandas() \
        .sort_values("vec_id", ignore_index=True)
    pd.testing.assert_frame_equal(batch, streamed)


def test_centroids_roundtrip(spark, tmp_path):
    df, _ = _mk(spark, n=30)
    cents = KM.kmeans_fit(df, k=3, iters=2)
    path = str(tmp_path / "centroids")
    KM.centroids_save(spark, cents, path)
    loaded = KM.centroids_load(spark, path)
    assert np.array_equal(np.array(loaded), np.array(cents))
    # loaded artifact drives assignment identically
    a = KM.kmeans_assign(df, loaded).select("vec_id", "cell").collect()
    b = KM.kmeans_assign(df, cents).select("vec_id", "cell").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
