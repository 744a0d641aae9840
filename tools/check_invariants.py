"""Scalable structural correctness gate for the dedup family.

DuckDB's pairwise oracles stop being runnable past sf1 on
duplicate-dense data (the q35 oracle spilled >78 GB of temp at sf10
and died), so this tool checks EXACT structural invariants whose
oracle side is a cheap aggregation:

1. dedup_exact keeps exactly countDistinct(case-folded normalized
   text) rows.
2. ngram_jaccard_pairs emits jaccard=1.0 for exactly the member pairs
   of exact-duplicate clusters with ≥k tokens — count == Σ C(sz,2)
   (different texts with identical shingle SETS would legitimately
   exceed this; a strict > is reported, not failed).
3. minhash_lsh_pairs: same jaccard=1.0 population (identical docs
   always collide in every band).
4. Cluster coherence: over star_intra edges + connected components,
   every exact-dup cluster's members land in ONE component.
5. Incremental exact dedup (parity split): |dedup_exact_against(new,
   index(old))| == countDistinct(fp over all) − countDistinct(fp over
   old) — the batch keeps exactly the fingerprints the corpus lacks.
6. Incremental MinHash (parity split): jaccard=1.0 new×index links ==
   Σ n_odd(c)·n_even(c) over exact-dup clusters with ≥k tokens
   (identical docs collide in every band, so none can be missed).
   NOTE this deliberately runs minhash_against on NOT-yet-exact-deduped
   sides — the dup-saturated stress — whereas the documented pipeline
   order (exact dedup first) removes identical texts before banding.
7. Incremental embedding (parity split): cosine≈1 new×index links ≥
   Σ n_odd(g)·n_even(g) over identical-VECTOR groups (identical
   vectors always share every hyperplane bucket; random bucket
   collisions are filtered by the ≥1−1e−9 cosine verify), exact-count
   equality reported.

8. Cluster-scoped SemDeDup at threshold 1−1e−9 keeps exactly
   count(DISTINCT embedding) rows: identical vectors share a k-means
   cell (assignment is value-determined) and the unique-vector lift +
   star edges collapse each identical group to its min-id rep. A
   genuine near-identical pair of DISTINCT vectors would legitimately
   reduce the count (≤ asserted, exactness reported).

Usage: python tools/check_invariants.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def check(sf_dir: str, spark) -> bool:
    import duckdb

    from juliadb_jl_spark.functions import dedup as DD

    from juliadb_jl_spark.sources.testdata import read_table

    con = duckdb.connect()
    norm = r"regexp_replace(trim(text), '\s+', ' ', 'g')"
    doc = f"read_parquet('{sf_dir}/documents.parquet')"
    n_ci = con.execute(
        f"SELECT count(DISTINCT lower({norm})) FROM {doc}").fetchone()[0]
    exp_pairs = con.execute(f"""
        SELECT coalesce(CAST(sum(c*(c-1)/2) AS BIGINT), 0) FROM (
          SELECT count(*) AS c FROM {doc}
          WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 3
          GROUP BY {norm} HAVING count(*) > 1) t""").fetchone()[0]

    docs = read_table(spark, sf_dir, "documents").cache()
    docs.count()
    results, ok = [], True

    def rec(name, passed, detail):
        nonlocal ok
        ok = ok and passed
        results.append((name, passed, detail))
        print(json.dumps({"sf_dir": sf_dir, "check": name,
                          "pass": bool(passed), "detail": detail}),
              flush=True)

    t0 = time.time()
    kept = DD.dedup_exact(docs, "doc_id").count()
    rec("dedup_exact_cardinality", kept == n_ci,
        f"kept={kept} distinct_ci={n_ci} ({time.time()-t0:.1f}s)")

    t0 = time.time()
    jac = DD.ngram_jaccard_pairs(docs, "doc_id", k=3, threshold=0.5)
    ones = jac.filter(F.col("jaccard") == 1.0).count()
    rec("jaccard_ones_eq_dup_member_pairs", ones >= exp_pairs,
        f"ones={ones} expected={exp_pairs} exact={ones == exp_pairs} "
        f"({time.time()-t0:.1f}s)")

    t0 = time.time()
    mh = DD.minhash_lsh_pairs(docs, "doc_id", threshold=0.5)
    m_ones = mh.filter(F.col("jaccard") == 1.0).count()
    rec("minhash_ones_eq_dup_member_pairs", m_ones >= exp_pairs,
        f"ones={m_ones} expected={exp_pairs} exact={m_ones == exp_pairs} "
        f"({time.time()-t0:.1f}s)")

    t0 = time.time()
    star = DD.ngram_jaccard_pairs(docs, "doc_id", k=3, threshold=0.5,
                                  star_intra=True)
    labels = DD.connected_components(star)
    clusters = (docs.filter(F.size(F.split(F.trim("text"), r"\s+")) >= 3)
                .select("doc_id",
                        F.md5(F.trim(F.regexp_replace("text", r"\s+", " ")))
                        .alias("fp")))
    sizes = clusters.groupBy("fp").count().filter(F.col("count") > 1)
    coher = (clusters.join(sizes.select("fp"), "fp", "left_semi")
             .join(labels.withColumnRenamed("node", "doc_id"), "doc_id")
             .groupBy("fp").agg(F.countDistinct("component").alias("nc"))
             .agg(F.coalesce(F.max("nc"), F.lit(1)).alias("mx")).head()["mx"])
    rec("cluster_coherence_one_component", coher == 1,
        f"max_components_per_cluster={coher} ({time.time()-t0:.1f}s)")

    t0 = time.time()
    from juliadb_jl_spark.functions import incremental as INC
    n_all = con.execute(
        f"SELECT count(DISTINCT md5(lower({norm}))) FROM {doc}").fetchone()[0]
    n_old = con.execute(
        f"SELECT count(DISTINCT md5(lower({norm}))) FROM {doc} "
        f"WHERE doc_id % 2 = 0").fetchone()[0]
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    kept_new = INC.dedup_exact_against(
        new, INC.dedup_index(old, "doc_id"), "doc_id").count()
    rec("incremental_exact_eq_fp_difference", kept_new == n_all - n_old,
        f"kept_new={kept_new} expected={n_all - n_old} "
        f"({time.time()-t0:.1f}s)")

    t0 = time.time()
    exp_x = con.execute(f"""
        SELECT coalesce(CAST(sum(odd*even) AS BIGINT), 0) FROM (
          SELECT sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS odd,
                 sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS even
          FROM {doc}
          WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 3
          GROUP BY {norm}) t""").fetchone()[0]
    links = INC.minhash_against(
        new, INC.minhash_index(old, "doc_id"), "doc_id", corpus_df=old,
        threshold=0.5)
    x_ones = links.filter(F.col("jaccard") == 1.0).count()
    rec("incremental_minhash_ones_eq_cross_dup_pairs", x_ones >= exp_x,
        f"ones={x_ones} expected={exp_x} exact={x_ones == exp_x} "
        f"({time.time()-t0:.1f}s)")

    t0 = time.time()
    ep = f"read_parquet('{sf_dir}/embeddings.parquet')"
    exp_e = con.execute(f"""
        SELECT coalesce(CAST(sum(odd*even) AS BIGINT), 0) FROM (
          SELECT sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS odd,
                 sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS even
          FROM {ep} GROUP BY embedding) t""").fetchone()[0]
    emb = read_table(spark, sf_dir, "embeddings")
    eold = emb.filter(F.col("vec_id") % 2 == 0)
    enew = emb.filter(F.col("vec_id") % 2 == 1)
    # 20 planes: random pairs rarely share all sign bits, and the few
    # that do are filtered by the near-1 cosine verify — candidates
    # stay ~= the identical-vector cross pairs at every rung
    e_links = INC.embedding_against(
        enew, INC.embedding_index(eold, "vec_id", "embedding",
                                  n_planes=20),
        "vec_id", "embedding", threshold=1 - 1e-9, n_planes=20).count()
    rec("incremental_embedding_ones_eq_cross_dup_pairs", e_links >= exp_e,
        f"links={e_links} expected={exp_e} exact={e_links == exp_e} "
        f"({time.time()-t0:.1f}s)")

    t0 = time.time()
    from juliadb_jl_spark.functions import clustering as KM
    n_dvec = con.execute(
        f"SELECT count(DISTINCT embedding) FROM {ep}").fetchone()[0]
    cents = KM.kmeans_fit(emb, k=4, iters=2)
    k_kept = KM.cluster_semantic_dedup(emb, cents,
                                       threshold=1 - 1e-9).count()
    rec("cluster_semdedup_keeps_distinct_vectors", k_kept <= n_dvec,
        f"kept={k_kept} distinct={n_dvec} exact={k_kept == n_dvec} "
        f"({time.time()-t0:.1f}s)")

    docs.unpersist()
    return ok


def main() -> None:
    from juliadb_jl_spark.session import get_spark
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    spark = get_spark("invariants")
    ok = True
    for d in dirs:
        ok = check(d, spark) and ok
    print(json.dumps({"all_ok": ok}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
