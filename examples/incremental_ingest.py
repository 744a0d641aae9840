"""Multi-day incremental-ingest loop — the append-only production shape.

Day 0 curates an initial corpus and SAVES its dedup indexes; each later
day loads the indexes, dedups the new crawl batch against them without
re-scanning the corpus, appends the survivors, and UPDATES the indexes
(merge for the exact index, append for the signature index).  The final
state is asserted equal to a one-shot dedup of everything — the
append-equivalence contract, demonstrated end-to-end through parquet.

Run: python examples/incremental_ingest.py [sf_dir] [workdir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import juliadb_jl_spark as jdb
from juliadb_jl_spark.functions import dedup as DD
from juliadb_jl_spark.functions import incremental as INC
from juliadb_jl_spark.sources.testdata import read_table


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ingest_loop"
    spark = jdb.get_spark("incremental-ingest-example")

    docs = read_table(spark, sf_dir, "documents")
    n = docs.count()
    # three "days": day 0 = first half; days 1-2 re-crawl overlapping
    # thirds with new ids (re-crawled text = exact duplicate to drop)
    day0 = docs.filter(F.col("doc_id") % 2 == 0)
    batches = [
        docs.filter(F.col("doc_id") % 3 == d)
            .withColumn("doc_id", F.col("doc_id") + 1_000_000 * d)
        for d in (1, 2)
    ]

    # --- day 0: curate + persist corpus and indexes. Index paths are
    # VERSIONED per day: the day-N update reads version N-1 and writes
    # version N — never overwriting a parquet it is lazily reading
    # (read-then-overwrite-in-place loses the input mid-write), and the
    # production-shaped atomic swap (readers keep a consistent version).
    corpus = DD.dedup_exact(day0, "doc_id")
    jdb.save(jdb.table(corpus, pkey="doc_id"), f"{work}/corpus",
             mode="overwrite")
    jdb.save(jdb.table(INC.dedup_index(corpus, "doc_id")),
             f"{work}/exact_idx_v0", mode="overwrite")
    jdb.save(jdb.table(INC.minhash_index(corpus, "doc_id")),
             f"{work}/mh_idx_v0", mode="overwrite")
    print(f"day 0: {corpus.count()} docs indexed")

    # --- days 1..N: load indexes, dedup batch, append, update indexes
    for day, batch in enumerate(batches, start=1):
        idx = jdb.load(f"{work}/exact_idx_v{day - 1}", spark).df
        fresh = INC.dedup_exact_against(batch, idx, "doc_id")
        mh = jdb.load(f"{work}/mh_idx_v{day - 1}", spark).df
        links = INC.minhash_against(
            fresh, mh, "doc_id", threshold=0.5, verify=False)
        n_b, n_f, n_l = batch.count(), fresh.count(), links.count()
        print(f"day {day}: {n_b} crawled -> {n_f} fresh "
              f"({n_b - n_f} already indexed; {n_l} near-dup candidates)")
        # append survivors + update both indexes (merge = min-id exact;
        # signatures of disjoint id sets just append)
        jdb.save(jdb.table(fresh, pkey="doc_id"), f"{work}/corpus",
                 mode="append")
        merged = INC.merge_dedup_index(idx, INC.dedup_index(fresh, "doc_id"))
        jdb.save(jdb.table(merged), f"{work}/exact_idx_v{day}",
                 mode="overwrite")
        jdb.save(jdb.table(INC.merge_minhash_index(
            mh, INC.minhash_index(fresh, "doc_id"))), f"{work}/mh_idx_v{day}",
            mode="overwrite")

    # --- the contract: the accumulated corpus == one-shot dedup of
    # everything that ever arrived (batch ids sort after day-0 ids)
    arrived = day0
    for b in batches:
        arrived = arrived.unionByName(b)
    oneshot = sorted(r["doc_id"] for r in
                     DD.dedup_exact(arrived, "doc_id").collect())
    accumulated = sorted(r["doc_id"] for r in
                         jdb.load(f"{work}/corpus", spark).df
                         .select("doc_id").collect())
    assert accumulated == oneshot, (len(accumulated), len(oneshot))
    print(f"contract holds: {len(accumulated)} docs accumulated == "
          f"one-shot dedup of all {arrived.count()} arrivals "
          f"(from {n} source docs)")


if __name__ == "__main__":
    main()
