"""Skew-stress proof harness (VERDICT r3 next #1).

Runs the dedup/join family on the uniform sf1 replication AND the
Zipf-skewed sf1skew variant (make_skew.py: 10k-member exact-dup doc
clique, one supplier owning ~10% of lineitem, 4k-member identical
embedding cluster), recording per-op wall time, result cardinality, a
straggler ratio (max/median task duration of the heaviest qualifying
stage, via the UI REST API), and DuckDB-checked structural invariants
on the skewed corpus (exact oracles that stay CHEAP — no quadratic
pair join in the oracle).

Usage: python tools/skew_proof.py [uniform_dir] [skew_dir]
Prints one JSON line per (dataset, op) and a final summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}",
                                timeout=10) as r:
        return json.load(r)


def _completed_stage_ids(spark) -> set[tuple[int, int]]:
    try:
        return {(s["stageId"], s["attemptId"])
                for s in _rest(spark, "/stages?status=complete")}
    except Exception:
        return set()


def _straggler(spark, before: set[tuple[int, int]]) -> dict | None:
    """Worst max/median task-duration ratio over stages completed since
    `before`, considering only stages with ≥8 tasks and a max task ≥1s
    (below that, scheduling jitter dominates and the ratio is noise)."""
    try:
        stages = _rest(spark, "/stages?status=complete")
    except Exception:
        return None
    worst = None
    for s in stages:
        key = (s["stageId"], s["attemptId"])
        if key in before or s.get("numCompleteTasks", 0) < 8:
            continue
        try:
            q = _rest(spark, f"/stages/{s['stageId']}/{s['attemptId']}"
                             "/taskSummary?quantiles=0.5,1.0")
        except Exception:
            continue
        p50, mx = q["duration"][0], q["duration"][1]
        if mx < 1000:
            continue
        # max/mean is the balance statistic that matters (max/median
        # explodes whenever a stage mixes real tasks with near-empty
        # ones); executorRunTime is the stage's TOTAL task time
        mean = s.get("executorRunTime", 0) / max(s["numCompleteTasks"], 1)
        if mean < 100:
            continue  # stage of near-empty tasks: ratio would be noise
        ratio = mx / max(mean, 1.0)
        if worst is None or ratio > worst["ratio"]:
            worst = {"ratio": round(ratio, 2), "stage": s["stageId"],
                     "tasks": s["numCompleteTasks"],
                     "p50_ms": round(p50), "mean_ms": round(mean),
                     "max_ms": round(mx)}
    return worst


def run(spark, label: str, name: str, thunk) -> dict:
    before = _completed_stage_ids(spark)
    t0 = time.time()
    result = thunk()
    wall = round(time.time() - t0, 2)
    rec = {"dataset": label, "op": name, "wall_sec": wall,
           "result": result, "straggler": _straggler(spark, before)}
    print(json.dumps(rec), flush=True)
    return rec


def _hot_key_joins(spark, label, li, supp, recs, salted_join, Table):
    """The hot-key join strategy table: supplier is broadcast-sized, so
    the FIRST skew answer is "broadcast the dim" (measured for
    reference); the salted and AQE comparisons force shuffle joins on
    both sides to model the both-sides-too-big case where the engine
    must pick between `salted_join` and Spark's built-in AQE skew-join
    split — the comparison that documents when salting is actually
    needed versus free."""
    def agg_count(j):
        return j.groupBy("s_nationkey").count().count()

    st = Table(supp, ("s_suppkey",))
    recs.append(run(
        spark, label, "join_broadcast",
        lambda: agg_count(li.join(F.broadcast(supp),
                                  li.l_suppkey == supp.s_suppkey))))
    recs.append(run(
        spark, label, "join_shuffle_plain",
        lambda: agg_count(li.hint("merge")
                          .join(supp.hint("merge"),
                                li.l_suppkey == supp.s_suppkey))))
    recs.append(run(
        spark, label, "join_salted",
        lambda: agg_count(salted_join(
            Table(li.withColumnRenamed("l_suppkey", "s_suppkey"),
                  ("l_orderkey",)),
            st, "s_suppkey").df)))

    # AQE skew-join split on the same forced-shuffle plan.  The default
    # 256 MB skewed-partition threshold never fires at this rung's
    # sizes, so scale it down (8 MB advisory/threshold, factor 2) to
    # make AQE split what it WOULD split on a 100-TB partition;
    # forceOptimizeSkewedJoin lets it add the extra shuffle the
    # downstream s_nationkey agg needs anyway.
    aqe_keys = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    saved = {}
    for k, v in aqe_keys.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        recs.append(run(
            spark, label, "join_aqe_skew",
            lambda: agg_count(li.hint("merge")
                              .join(supp.hint("merge"),
                                    li.l_suppkey == supp.s_suppkey))))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def main() -> None:
    boiler_only = "--boiler-only" in sys.argv  # just the hot-shingle section
    joins_only = "--joins-only" in sys.argv    # just the hot-key join table
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    uniform = argv[0] if len(argv) > 0 else "/root/repo/.testdata/sf1"
    skewed = argv[1] if len(argv) > 1 else "/root/repo/.testdata/sf1skew"
    from juliadb_jl_spark.functions import dedup as DD
    from juliadb_jl_spark.operators.join import salted_join
    from juliadb_jl_spark.plans.table import Table
    from juliadb_jl_spark.session import get_spark
    from juliadb_jl_spark.sources.testdata import read_table

    spark = get_spark("skew_proof", extra_conf={"spark.ui.enabled": "true"})
    recs = []
    for label, sf_dir in ([] if boiler_only
                          else [("uniform", uniform), ("skewed", skewed)]):
        docs = read_table(spark, sf_dir, "documents").cache()
        li = read_table(spark, sf_dir, "lineitem").cache()
        li.count()
        supp = read_table(spark, sf_dir, "supplier").cache()
        supp.count()
        if joins_only:
            _hot_key_joins(spark, label, li, supp, recs, salted_join, Table)
            li.unpersist(); supp.unpersist()
            continue
        docs.count()

        recs.append(run(spark, label, "dedup_exact",
                        lambda: DD.dedup_exact(docs, "doc_id").count()))
        jac = DD.ngram_jaccard_pairs(docs, "doc_id", k=3, threshold=0.5)
        jac = jac.persist()
        recs.append(run(spark, label, "ngram_jaccard_pairs",
                        lambda: jac.count()))
        recs.append(run(
            spark, label, "connected_components",
            lambda: DD.connected_components(jac)
            .groupBy("component").count().agg(F.max("count")).head()[0]))
        jac.unpersist()
        # the production cluster-resolution path: CC over the sparse
        # star_intra edge set (component-equivalent, O(members) edges)
        recs.append(run(
            spark, label, "cc_star_edges",
            lambda: DD.connected_components(
                DD.ngram_jaccard_pairs(docs, "doc_id", k=3, threshold=0.5,
                                       star_intra=True))
            .groupBy("component").count().agg(F.max("count")).head()[0]))
        recs.append(run(
            spark, label, "minhash_lsh_pairs",
            lambda: DD.minhash_lsh_pairs(docs, "doc_id",
                                         threshold=0.5).count()))
        recs.append(run(
            spark, label, "simhash_pairs",
            lambda: DD.simhash_pairs(docs, "doc_id").count()))
        recs.append(run(
            spark, label, "dedup_substrings",
            lambda: DD.dedup_substrings(docs, "doc_id", k=20).count()))

        _hot_key_joins(spark, label, li, supp, recs, salted_join, Table)

        docs.unpersist(); li.unpersist(); supp.unpersist()

    if joins_only:
        by = {(r["dataset"], r["op"]): r for r in recs}
        ok = (by[("skewed", "join_salted")]["result"]
              == by[("skewed", "join_shuffle_plain")]["result"]
              == by[("skewed", "join_broadcast")]["result"]
              == by[("skewed", "join_aqe_skew")]["result"])
        print(json.dumps({"all_ok": ok}), flush=True)
        return

    # --- hot-SHINGLE skew (shared boilerplate, different texts): the
    # unique-text lift can't help (texts differ), so the guards are
    # jaccard's df_cap (drop ubiquitous shingles) and minhash's
    # bucket_cap (drop overfull band buckets). True ≥0.5 pairs on this
    # corpus are exactly 0 (boilerplate overlap tops out at ~0.33), so
    # capped and exact results must agree where both are feasible.
    boiler = ("the quick brown fox jumps over the lazy dog again and "
              "again today")
    def boiler_docs(n):
        return (spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit(boiler + " "),
                     F.concat_ws(" ", *[
                         F.format_string(f"w{i}_%d", F.col("id"))
                         for i in range(10)])).alias("text"))
            .cache())

    small, big = boiler_docs(5000), boiler_docs(50000)
    small.count(); big.count()
    r_exact = run(spark, "boiler5k", "jaccard_exact",
                  lambda: DD.ngram_jaccard_pairs(
                      small, "doc_id", threshold=0.5).count())
    r_cap = run(spark, "boiler5k", "jaccard_df_cap",
                lambda: DD.ngram_jaccard_pairs(
                    small, "doc_id", threshold=0.5, df_cap=1000).count())
    r_cap_big = run(spark, "boiler50k", "jaccard_df_cap",
                    lambda: DD.ngram_jaccard_pairs(
                        big, "doc_id", threshold=0.5, df_cap=1000).count())
    m_exact = run(spark, "boiler5k", "minhash_exact",
                  lambda: DD.minhash_lsh_pairs(
                      small, "doc_id", threshold=0.5).count())
    m_cap_big = run(spark, "boiler50k", "minhash_bucket_cap",
                    lambda: DD.minhash_lsh_pairs(
                        big, "doc_id", threshold=0.5,
                        bucket_cap=1000).count())
    # auto mode: the cap is sized from the corpus's own histogram. At
    # 50k docs the boilerplate fanout (12 shingles × C(50k,2) ≈ 15B;
    # hot band buckets ~n/16 docs) blows the 32×postings budget, so
    # auto ENGAGES here — the engagement value is recorded below; the
    # sub-floor no-op half of the contract is unit-tested.
    from juliadb_jl_spark.functions.text import shingles as _shingles
    jcap_auto = DD._auto_cap(
        big.select(F.explode(F.array_distinct(
            _shingles(F.col("text"), 3))).alias("h")).groupBy("h").count())
    r_auto_big = run(spark, "boiler50k", "jaccard_df_cap_auto",
                     lambda: DD.ngram_jaccard_pairs(
                         big, "doc_id", threshold=0.5,
                         df_cap="auto").count())
    m_auto_big = run(spark, "boiler50k", "minhash_bucket_cap_auto",
                     lambda: DD.minhash_lsh_pairs(
                         big, "doc_id", threshold=0.5,
                         bucket_cap="auto").count())
    small.unpersist(); big.unpersist()
    boiler_checks = {
        "jaccard_df_cap_matches_exact_5k":
            r_cap["result"] == r_exact["result"],
        "minhash_caps_agree_zero_pairs":
            m_exact["result"] == m_cap_big["result"] == r_cap_big["result"],
        "auto_caps_agree_zero_pairs":
            r_auto_big["result"] == m_auto_big["result"]
            == m_exact["result"],
        "jaccard_auto_cap_engaged": jcap_auto is not None,
    }
    print(json.dumps({"boiler_checks": boiler_checks,
                      "jaccard_auto_cap": jcap_auto}), flush=True)
    if boiler_only:
        print(json.dumps({"all_ok": all(boiler_checks.values())}),
              flush=True)
        return

    # --- structural invariants on the skewed corpus (cheap exact oracle)
    import duckdb
    con = duckdb.connect()
    norm = r"regexp_replace(trim(text), '\s+', ' ', 'g')"
    H = con.execute(
        f"SELECT count(*) FROM read_parquet('{skewed}/documents.parquet') "
        f"WHERE {norm} = (SELECT {norm} FROM "
        f"read_parquet('{skewed}/documents.parquet') q GROUP BY 1 "
        f"ORDER BY count(*) DESC LIMIT 1)").fetchone()[0]
    distinct_ci = con.execute(
        f"SELECT count(DISTINCT lower({norm})) FROM "
        f"read_parquet('{skewed}/documents.parquet')").fetchone()[0]
    by = {(r["dataset"], r["op"]): r for r in recs}
    checks = {
        # dedup_exact keeps one row per case-folded normalized text
        "dedup_exact_eq_distinct":
            by[("skewed", "dedup_exact")]["result"] == distinct_ci,
        # the giant clique survives pair-gen + CC intact: the largest
        # connected component is exactly the hot cluster
        "cc_max_component_eq_hot_cluster":
            by[("skewed", "connected_components")]["result"] == H,
        "cc_star_component_equivalent":
            by[("skewed", "cc_star_edges")]["result"] == H,
        # every pair generator emits at least the clique's member pairs
        "jaccard_pairs_cover_clique":
            by[("skewed", "ngram_jaccard_pairs")]["result"] >= H * (H - 1) // 2,
        "minhash_pairs_cover_clique":
            by[("skewed", "minhash_lsh_pairs")]["result"] >= H * (H - 1) // 2,
        # all four join strategies agree on the result cardinality
        "salted_join_matches_plain":
            by[("skewed", "join_salted")]["result"]
            == by[("skewed", "join_shuffle_plain")]["result"]
            == by[("skewed", "join_broadcast")]["result"]
            == by[("skewed", "join_aqe_skew")]["result"],
    }
    print(json.dumps({"hot_cluster": H, "checks": checks,
                      "all_ok": all(checks.values())
                      and all(boiler_checks.values())}), flush=True)


if __name__ == "__main__":
    main()
